"""Batched associative-embedding grouping as a single Pallas TPU kernel.

``ops.group.match_by_tag`` runs the per-joint greedy clustering as a
``lax.scan`` whose inner greedy assignment is itself a ``lax.fori_loop`` —
~420 sequential XLA ops of a few microseconds each, ~12 ms for a
batch-128 decode on v5e regardless of content (the "empty-scan floor",
PERF_NOTES.md).  This kernel runs the identical algorithm with the batch
laid out on the 128 VPU lanes and every step as an in-kernel vector op
(nanoseconds each), so the whole batch groups in ~1 ms.

Semantics are bit-compatible with ``group.match_by_tag`` in greedy mode
(same cost construction, same row-major argmin tie-breaking, same
join/spawn bookkeeping) — the reference algorithm is
``/root/reference/lib/core/group.py:26-97``; parity is tested in
tests/test_pallas_group.py against both the XLA scan and the numpy oracle.

Scope: serving decode (assignment='greedy', single tag dim T=1).  The
eval path (exact Hungarian, flip-test T=2) stays on the XLA scan.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .group import CLIP_COST, PAD_COST, StaticGroupCfg

LANES = 128
# python floats (not jnp scalars): pallas kernels may not capture tracers
BIG = 3e38
_CLIP = float(CLIP_COST)
_PAD = float(PAD_COST)


def _group_kernel(tag_ref, val_ref, cid_ref, ncl_ref, *, cfg: StaticGroupCfg,
                  K: int, M: int):
    """One grid step: groups a lane-width slice of the batch.

    tag_ref: (K, M, LANES) f32 — tag scalar per (joint, peak, image)
    val_ref: (K, M, LANES) f32 — detection scores (sorted desc over M)
    cid_ref: (K, M, LANES) i32 out — cluster id per joint/peak (-1 = none)
    ncl_ref: (1, LANES) i32 out — number of clusters per image
    """
    P = cfg.max_people  # assignment columns (reference joint_dict growth cap)
    PC = cfg.max_clusters

    iota_m = lax.broadcasted_iota(jnp.int32, (M, LANES), 0)
    iota_p = lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    iota_mp_m = lax.broadcasted_iota(jnp.int32, (M * P, LANES), 0) // P
    iota_mp_p = lax.broadcasted_iota(jnp.int32, (M * P, LANES), 0) % P

    # running state, batch on lanes
    tag_sum = jnp.zeros((P, LANES), jnp.float32)
    tag_cnt = jnp.zeros((P, LANES), jnp.float32)
    n_cl = jnp.zeros((1, LANES), jnp.int32)

    for step_i, k in enumerate(cfg.joint_order):
        tags = tag_ref[0, k]  # (M, LANES)
        val = val_ref[0, k]
        mask = val > cfg.detection_threshold  # (M, LANES)

        is_first = (n_cl == 0) if step_i else jnp.ones((1, LANES), jnp.bool_)
        if cfg.ignore_too_much:
            skip = (~is_first) & (n_cl >= cfg.max_people)
        else:
            skip = jnp.zeros((1, LANES), jnp.bool_)
        do_match = (~is_first) & (~skip)  # (1, LANES)

        # ---- cost over (peak m, cluster col g) ---------------------------
        G = jnp.minimum(n_cl, cfg.max_people)  # (1, LANES)
        mean = tag_sum / jnp.maximum(tag_cnt, 1.0)  # (P, LANES)
        diff = jnp.abs(tags[:, None, :] - mean[None, :, :])  # (M, P, LANES); T=1
        col_valid = iota_p < G  # (P, LANES)
        if cfg.use_detection_val:
            base = jnp.minimum(jnp.round(diff) * 100.0, _CLIP) - val[:, None, :]
        else:
            base = jnp.minimum(diff, _CLIP)
        cost = jnp.where(col_valid[None], base, _PAD)
        # greedy_assign semantics: invalid (masked) rows never participate
        cost = jnp.where(mask[:, None, :] & do_match[None], cost, BIG)
        c = cost.reshape(M * P, LANES)

        # ---- greedy min-cost matching, all lanes in parallel -------------
        assign = jnp.full((M, LANES), M, jnp.int32)  # M = "unassigned"
        for _ in range(min(M, P)):
            cmin = jnp.min(c, axis=0)  # (LANES,)
            amin = jnp.argmin(c, axis=0).astype(jnp.int32)  # row-major ties
            ok = (cmin < BIG)[None]  # (1, LANES)
            m_sel = (amin // P)[None]  # (1, LANES)
            g_sel = (amin % P)[None]
            row_hit = iota_m == m_sel  # (M, LANES)
            col_hit = iota_p == g_sel  # (P, LANES)
            assign = jnp.where(row_hit & ok, g_sel, assign)
            kill = (iota_mp_m == m_sel) | (iota_mp_p == g_sel)
            c = jnp.where(kill & ok, BIG, c)

        # ---- join / spawn -------------------------------------------------
        safe = jnp.minimum(assign, P - 1)
        onehot_g = iota_p[None] == safe[:, None, :]  # (M, P, LANES)
        matched_diff = jnp.sum(jnp.where(onehot_g, diff, 0.0), axis=1)  # (M, LANES)
        join = (
            do_match & mask & (assign < G) & (matched_diff < cfg.tag_threshold)
        )
        spawn = mask & (is_first | (do_match & (~join)))

        # spawn slots in peak order: exclusive running count over m
        # (cumsum is not lowerable in Mosaic; use a triangular matmul)
        tri = (
            lax.broadcasted_iota(jnp.int32, (M, M), 0)
            >= lax.broadcasted_iota(jnp.int32, (M, M), 1)
        ).astype(jnp.float32)
        rank = jnp.dot(
            tri, spawn.astype(jnp.float32), preferred_element_type=jnp.float32
        ).astype(jnp.int32) - 1  # (M, LANES) inclusive-count - 1
        spawn_slot = n_cl + rank  # (M, LANES) (broadcast over rows)
        cid_join = jnp.where(join, assign, -1)
        cid_spawn = jnp.where(spawn & (spawn_slot < PC), spawn_slot, -1)
        cid = jnp.maximum(cid_join, cid_spawn)  # disjoint conditions
        cid_ref[0, k] = cid

        # ---- state updates -------------------------------------------------
        # joins: assignment is injective per lane -> sum one-hots
        join_oh = onehot_g & join[:, None, :]  # (M, P, LANES)
        tag_sum = tag_sum + jnp.sum(jnp.where(join_oh, tags[:, None, :], 0.0), 0)
        tag_cnt = tag_cnt + jnp.sum(join_oh.astype(jnp.float32), 0)
        # spawns: slot ids are distinct per lane
        spawn_oh = (iota_p[None] == cid_spawn[:, None, :]) & (cid_spawn >= 0)[:, None, :]
        tag_sum = jnp.where(
            jnp.any(spawn_oh, 0), jnp.sum(jnp.where(spawn_oh, tags[:, None, :], 0.0), 0), tag_sum
        )
        tag_cnt = jnp.where(jnp.any(spawn_oh, 0), 1.0, tag_cnt)
        n_cl = jnp.minimum(n_cl + jnp.sum(spawn.astype(jnp.int32), 0, keepdims=True), PC)

    ncl_ref[0] = n_cl


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_by_tag_batch_pallas(
    tag_k: jnp.ndarray,  # (B, K, M, 1)
    loc_k: jnp.ndarray,  # (B, K, M, 2)
    val_k: jnp.ndarray,  # (B, K, M)
    cfg: StaticGroupCfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy grouping. Returns (people (B, P, K, 4), n_cl (B,))."""
    B, K, M, T = tag_k.shape
    assert T == 1, "pallas grouping supports a single tag dim (serving)"
    P = cfg.max_clusters

    pad = (-B) % LANES
    tags = jnp.pad(tag_k[..., 0], ((0, pad), (0, 0), (0, 0)))
    vals = jnp.pad(val_k, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    nblk = Bp // LANES

    # (B, K, M) -> (nblk, K, M, LANES)
    tags_l = jnp.transpose(tags.reshape(nblk, LANES, K, M), (0, 2, 3, 1))
    vals_l = jnp.transpose(vals.reshape(nblk, LANES, K, M), (0, 2, 3, 1))

    kern = functools.partial(_group_kernel, cfg=cfg, K=K, M=M)
    cid_l, ncl_l = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nblk, K, M, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nblk, 1, LANES), jnp.int32),
        ),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, K, M, LANES), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, M, LANES), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, M, LANES), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests use interpreter
    )(tags_l, vals_l)

    cid = jnp.transpose(cid_l, (0, 3, 1, 2)).reshape(Bp, K, M)[:B]  # (B, K, M)
    n_cl = ncl_l.reshape(Bp)[:B]

    # assemble people: one batched scatter (parallel, no sequential chain)
    joints = jnp.concatenate(
        [loc_k, val_k[..., None], tag_k], axis=-1
    )  # (B, K, M, 3+T)
    safe_cid = jnp.where(cid >= 0, cid, P)  # P -> dropped

    def scatter_one(j, c):
        # j: (K, M, 3+T), c: (K, M)
        out = jnp.zeros((P, K, 3 + T), jnp.float32)
        kk = jnp.broadcast_to(jnp.arange(K)[:, None], (K, M))
        return out.at[c, kk].set(j, mode="drop")

    people = jax.vmap(scatter_one)(joints, safe_cid)
    return people, n_cl

"""Batched associative-embedding grouping as a single Pallas TPU kernel.

``ops.group.match_by_tag`` runs the per-joint clustering as a ``lax.scan``
whose inner assignment is itself a loop — hundreds of sequential XLA ops of
a few microseconds each (~12 ms greedy / ~34 ms exact-Hungarian for a
batch-64/128 decode on v5e regardless of content: the XLA op-dispatch
floor, see PERF_NOTES.md).  This kernel runs the identical algorithms with
the batch laid out on the 128 VPU lanes and every step as an in-kernel
vector op (nanoseconds each), so the whole batch groups in ~1-3 ms.

Two assignment modes, matching ``StaticGroupCfg.assignment``:

- ``greedy`` (serving): fixed-iteration global-min matching — bit-compatible
  with ``hungarian.greedy_assign``.
- ``hungarian`` (eval parity): the exact potentials + shortest-augmenting-
  path solver (``hungarian.hungarian_prefix``) vectorized across lanes —
  per-lane gathers/scatters become one-hot masked reductions, the
  data-dependent ``while`` loops become fixed-bound masked ``fori`` loops
  (row r's Dijkstra needs at most r+1 sweeps), and the row loop is bounded
  by the batch's max valid-peak count.  Identical arithmetic order in fp32,
  so assignments (including tie-breaks) match the XLA solver exactly.

Tag dimension T is 1 (single forward) or 2 (flip-test eval).

Semantics are bit-compatible with ``group.match_by_tag`` (same cost
construction, same argmin tie-breaking, same join/spawn bookkeeping) — the
reference algorithm is ``/root/reference/lib/core/group.py:26-97``; parity
is tested in tests/test_pallas_group.py against both the XLA scan and the
numpy oracle.
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

from .runtime import resolve_interpret

LANES = 128
# python floats (not jnp scalars): pallas kernels may not capture tracers
BIG = 3e38
INF = 1e18  # hungarian sentinel (matches ops.hungarian.INF)
_CLIP = float(CLIP_COST)
_PAD = float(PAD_COST)


def _jv_assign(cost, n_solve, M):
    """Exact min-cost prefix assignment, all lanes in parallel.

    cost: (M, M, LANES) f32 — rows are score-sorted peaks, columns cluster
        slots (PAD-filled beyond the live count, as in the XLA path).
    n_solve: (1, LANES) i32 — rows to assign per lane (0 = no-op lane).
    Returns assign (M, LANES) i32 — column per row, M = unassigned.

    Mirrors ``hungarian.hungarian_prefix`` operation-for-operation (same
    fp32 arithmetic order, same first-min tie-breaking) with per-lane
    state vectors and one-hot gathers/scatters.
    """
    n1 = M + 1
    iota_r = lax.broadcasted_iota(jnp.int32, (n1, LANES), 0)

    # a: (n1, n1, LANES), sentinel row/col 0 = 0
    a = jnp.concatenate(
        [
            jnp.zeros((1, n1, LANES), jnp.float32),
            jnp.concatenate(
                [jnp.zeros((M, 1, LANES), jnp.float32), cost], axis=1
            ),
        ],
        axis=0,
    )

    u0 = jnp.zeros((n1, LANES), jnp.float32)
    v0 = jnp.zeros((n1, LANES), jnp.float32)
    p0 = jnp.zeros((n1, LANES), jnp.int32)

    def row_body(r, carry):
        u, v, p = carry
        i = r + 1  # 1-indexed row
        act_row = r < n_solve  # (1, LANES)
        p = jnp.where((iota_r == 0) & act_row, i, p)

        # mask carries are int32 0/1: Mosaic cannot legalize i1 vector
        # region args in scf.for
        minv0 = jnp.full((n1, LANES), INF, jnp.float32)
        used0 = jnp.zeros((n1, LANES), jnp.int32)
        way0 = jnp.zeros((n1, LANES), jnp.int32)
        j00 = jnp.zeros((1, LANES), jnp.int32)
        done0 = jnp.where(act_row, 0, 1).astype(jnp.int32)

        def dij_body(_, st):
            u, v, minv, used_i, way, j0, p, done_i = st
            act = done_i == 0  # (1, LANES) bool
            oh_j0 = iota_r == j0  # (n1, LANES)
            used_i = jnp.where(oh_j0 & act, 1, used_i)
            used = used_i != 0
            i0 = jnp.sum(jnp.where(oh_j0, p, 0), 0, keepdims=True)  # p[j0]
            oh_i0 = iota_r == i0  # (n1, LANES) over the row axis
            arow = jnp.sum(jnp.where(oh_i0[:, None, :], a, 0.0), 0)  # a[i0]
            u_i0 = jnp.sum(jnp.where(oh_i0, u, 0.0), 0, keepdims=True)
            cur = arow - u_i0 - v
            better = (cur < minv) & (~used) & act
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used | (iota_r == 0), INF, minv)
            delta = jnp.min(masked, 0, keepdims=True)  # (1, LANES)
            j1 = jnp.min(
                jnp.where(masked == delta, iota_r, n1), 0, keepdims=True
            )  # first-min index, like jnp.argmin
            # potentials: u[p[j]] += delta, v[j] -= delta for used cols j
            # (tree rows are distinct per lane -> one-hot sum is a gather)
            ohp = (iota_r[:, None, :] == p[None, :, :]) & used[None, :, :]
            uadd = jnp.sum(ohp.astype(jnp.float32), 1) * delta
            u = u + jnp.where(act, uadd, 0.0)
            v = v - jnp.where(used & act, delta, 0.0)
            minv = jnp.where((~used) & act, minv - delta, minv)
            j0 = jnp.where(act, j1, j0)
            oh_j1 = iota_r == j1
            p_j1 = jnp.sum(jnp.where(oh_j1, p, 0), 0, keepdims=True)
            done_i = jnp.where(act & (p_j1 == 0), 1, done_i)
            return (u, v, minv, used_i, way, j0, p, done_i)

        # row i's augmenting search sweeps at most i+1 columns
        u, v, minv, used_i, way, j0, p, done_i = lax.fori_loop(
            0, i + 1, dij_body, (u, v, minv0, used0, way0, j00, p, done0)
        )

        def back_body(_, st):
            j0, p = st
            act_b = (j0 != 0) & act_row
            oh = iota_r == j0
            j1 = jnp.sum(jnp.where(oh, way, 0), 0, keepdims=True)
            oh1 = iota_r == j1
            p_j1 = jnp.sum(jnp.where(oh1, p, 0), 0, keepdims=True)
            p = jnp.where(oh & act_b, p_j1, p)
            j0 = jnp.where(act_b, j1, j0)
            return (j0, p)

        _, p = lax.fori_loop(0, i + 1, back_body, (j0, p))
        return (u, v, p)

    R = jnp.max(n_solve)  # scalar: lockstep bound = batch max valid count
    _, _, p = lax.fori_loop(0, R, row_body, (u0, v0, p0))

    # invert: assign[m] = j-1 where p[j] == m+1; unassigned -> M
    iota_m = lax.broadcasted_iota(jnp.int32, (M, M, LANES), 0)
    iota_j = lax.broadcasted_iota(jnp.int32, (M, M, LANES), 1)
    pm = jnp.expand_dims(lax.slice_in_dim(p, 1, M + 1, axis=0) - 1, 0)
    ohm = iota_m == pm  # (M rows, M cols, LANES)
    matched = jnp.any(ohm, 1)  # (M, LANES)
    assign = jnp.sum(jnp.where(ohm, iota_j, 0), 1)
    return jnp.where(matched, assign, M)


def _group_kernel(tag_ref, val_ref, cid_ref, ncl_ref, *, cfg: StaticGroupCfg,
                  K: int, M: int, T: int):
    """One grid step: groups a lane-width slice of the batch.

    tag_ref: (1, T, K, M, LANES) f32 — tag scalars per (joint, peak, image)
    val_ref: (1, K, M, LANES) f32 — detection scores (sorted desc over M)
    cid_ref: (1, K, M, LANES) i32 out — cluster id per joint/peak (-1 = none)
    ncl_ref: (1, LANES) i32 out — number of clusters per image
    """
    P = cfg.max_people  # assignment columns (reference joint_dict growth cap)
    PC = cfg.max_clusters

    iota_m = lax.broadcasted_iota(jnp.int32, (M, LANES), 0)
    iota_p = lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    iota_mp_m = lax.broadcasted_iota(jnp.int32, (M * P, LANES), 0) // P
    iota_mp_p = lax.broadcasted_iota(jnp.int32, (M * P, LANES), 0) % P

    # running state, batch on lanes
    tag_sum = [jnp.zeros((P, LANES), jnp.float32) for _ in range(T)]
    tag_cnt = jnp.zeros((P, LANES), jnp.float32)
    n_cl = jnp.zeros((1, LANES), jnp.int32)

    for step_i, k in enumerate(cfg.joint_order):
        tags = [tag_ref[0, t, k] for t in range(T)]  # T x (M, LANES)
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
        safe_cnt = jnp.maximum(tag_cnt, 1.0)
        if T == 1:
            mean = tag_sum[0] / safe_cnt  # (P, LANES)
            diff = jnp.abs(tags[0][:, None, :] - mean[None, :, :])  # (M,P,L)
        else:
            acc = jnp.zeros((M, P, LANES), jnp.float32)
            for t in range(T):
                mean_t = tag_sum[t] / safe_cnt
                d = tags[t][:, None, :] - mean_t[None, :, :]
                acc = acc + d * d
            diff = jnp.sqrt(acc)
        col_valid = iota_p < G  # (P, LANES)
        if cfg.use_detection_val:
            base = jnp.minimum(jnp.round(diff) * 100.0, _CLIP) - val[:, None, :]
        else:
            base = jnp.minimum(diff, _CLIP)
        cost = jnp.where(col_valid[None], base, _PAD)

        if cfg.assignment != "greedy":
            # exact prefix assignment over the full PAD-padded matrix
            # (matches match_by_tag: n_solve rows, sorted-prefix masking;
            # same default polarity too — anything not 'greedy' is exact)
            n_valid = jnp.sum(mask.astype(jnp.int32), 0, keepdims=True)
            n_solve = jnp.where(do_match, n_valid, 0)
            assert M == P, "hungarian grouping expects square cost"
            assign = _jv_assign(cost, n_solve, M)
        else:
            # greedy_assign semantics: invalid (masked) rows never participate
            c = jnp.where(mask[:, None, :] & do_match[None], cost, BIG)
            c = c.reshape(M * P, LANES)
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
        spawn_oh = (iota_p[None] == cid_spawn[:, None, :]) & (cid_spawn >= 0)[:, None, :]
        any_spawn = jnp.any(spawn_oh, 0)  # (P, LANES)
        for t in range(T):
            s = tag_sum[t] + jnp.sum(
                jnp.where(join_oh, tags[t][:, None, :], 0.0), 0
            )
            # spawns: slot ids are distinct per lane
            tag_sum[t] = jnp.where(
                any_spawn,
                jnp.sum(jnp.where(spawn_oh, tags[t][:, None, :], 0.0), 0),
                s,
            )
        tag_cnt = tag_cnt + jnp.sum(join_oh.astype(jnp.float32), 0)
        tag_cnt = jnp.where(any_spawn, 1.0, tag_cnt)
        n_cl = jnp.minimum(n_cl + jnp.sum(spawn.astype(jnp.int32), 0, keepdims=True), PC)

    ncl_ref[0] = n_cl


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_by_tag_batch_pallas(
    tag_k: jnp.ndarray,  # (B, K, M, T)
    loc_k: jnp.ndarray,  # (B, K, M, 2)
    val_k: jnp.ndarray,  # (B, K, M)
    cfg: StaticGroupCfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched grouping (greedy or exact-Hungarian per ``cfg.assignment``).
    Returns (people (B, P, K, 3+T), n_cl (B,))."""
    B, K, M, T = tag_k.shape
    assert T in (1, 2), "pallas grouping supports tag dim 1 or 2"
    P = cfg.max_clusters

    pad = (-B) % LANES
    tags = jnp.pad(tag_k, ((0, pad), (0, 0), (0, 0), (0, 0)))
    vals = jnp.pad(val_k, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    nblk = Bp // LANES

    # (B, K, M, T) -> (nblk, T, K, M, LANES)
    tags_l = jnp.transpose(tags.reshape(nblk, LANES, K, M, T), (0, 4, 2, 3, 1))
    vals_l = jnp.transpose(vals.reshape(nblk, LANES, K, M), (0, 2, 3, 1))

    kern = functools.partial(_group_kernel, cfg=cfg, K=K, M=M, T=T)
    cid_l, ncl_l = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nblk, K, M, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nblk, 1, LANES), jnp.int32),
        ),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, T, K, M, LANES), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, M, LANES), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, K, M, LANES), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=resolve_interpret(cfg.interpret),
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

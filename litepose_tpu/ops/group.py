"""On-device associative-embedding grouping (batched, static shapes).

The reference decodes on the host: per-joint Munkres matching in Python
(``/root/reference/lib/core/group.py:26-97``) after copying tensors off the
GPU (:170-174) — the CPU bottleneck of its eval pipeline.  Here the entire
decode — NMS, top-k, greedy tag clustering with optimal assignment,
quarter-pixel adjustment, and missing-joint refinement — is one jittable
XLA program: a ``lax.scan`` over joints in grouping order carrying a
fixed-capacity cluster table, with a fixed-size Hungarian solve per step
(``litepose_tpu.ops.hungarian``), vmapped over the batch.

Semantics match ``group_ref.parse_np`` (the numpy oracle mirroring the
reference) up to assignment tie-breaking; verified in tests/test_group.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .group_ref import GroupParams
from .hungarian import greedy_assign, hungarian_prefix
from .nms import top_k_peaks

# The reference pads unmatched columns with 1e10 in float64
# (/root/reference/lib/core/group.py:75).  Our Hungarian runs in fp32 on
# device, where 1e10 swamps the O(100) real-cost differences (fp32 spacing
# at 1e10 is ~1024), so we clip real costs at CLIP_COST and pad with
# PAD_COST instead.  Any clipped pair has round(||tag diff||) >= 80, far
# beyond any usable tag_threshold, so it could never produce a join — the
# clip only collapses ties among never-joinable options.
PAD_COST = jnp.float32(1e4)
CLIP_COST = jnp.float32(8e3)


class StaticGroupCfg(NamedTuple):
    """Hashable subset of GroupParams used inside jit."""

    joint_order: Tuple[int, ...]
    max_people: int
    max_clusters: int
    detection_threshold: float
    tag_threshold: float
    use_detection_val: bool
    ignore_too_much: bool
    nms_kernel: int
    nms_padding: int
    # 'hungarian' = exact optimal assignment (eval parity);
    # 'greedy' = fixed-iteration global-min matching (serving fast path:
    # data-independent cost, no vmap lockstep stragglers)
    assignment: str = "hungarian"
    # 'exact' = chunked exact top-k; 'approx' = lax.approx_max_k (serving)
    topk_method: str = "exact"
    # Pallas lowering: None = follow the backend (Mosaic on TPU,
    # interpreter elsewhere); True/False pins it — set by AOT export
    # (core/export.py), which traces for a platform the host may not have.
    # Part of the cfg so it participates in every jit cache key.
    interpret: bool | None = None

    @staticmethod
    def from_params(p: GroupParams, assignment: str = "hungarian",
                    topk_method: str = "exact") -> "StaticGroupCfg":
        return StaticGroupCfg(
            joint_order=tuple(p.joint_order),
            max_people=p.max_num_people,
            max_clusters=max(p.max_clusters, p.max_num_people),
            detection_threshold=p.detection_threshold,
            tag_threshold=p.tag_threshold,
            use_detection_val=p.use_detection_val,
            ignore_too_much=p.ignore_too_much,
            nms_kernel=p.nms_kernel,
            nms_padding=p.nms_padding,
            assignment=assignment,
            topk_method=topk_method,
        )


def match_by_tag(
    tag_k: jnp.ndarray,  # (K, M, T)
    loc_k: jnp.ndarray,  # (K, M, 2)
    val_k: jnp.ndarray,  # (K, M)
    cfg: StaticGroupCfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy per-joint clustering. Returns (clusters (P, K, 3+T), n_clusters).

    Cluster table rows are in creation order, matching the insertion order of
    the reference's ``joint_dict`` so downstream person indexing agrees."""
    K, M, T = tag_k.shape
    P = cfg.max_clusters
    order = jnp.asarray(cfg.joint_order, jnp.int32)

    # Pre-permute into grouping order; scan steps are then sequential rows.
    tags_o = tag_k[order]
    joints_o = jnp.concatenate([loc_k, val_k[..., None], tag_k], axis=-1)[order]

    init = (
        jnp.zeros((P, K, 3 + T), jnp.float32),  # cluster joints
        jnp.zeros((P, T), jnp.float32),  # running tag sums
        jnp.zeros((P,), jnp.float32),  # tag counts
        jnp.int32(0),  # number of clusters
    )

    def step(carry, xs):
        cl_joints, tag_sum, tag_cnt, n_cl = carry
        step_i, idx, tags, joints = xs  # tags (M,T); joints (M, 3+T)
        val = joints[:, 2]
        mask = val > cfg.detection_threshold

        is_first = (step_i == 0) | (n_cl == 0)
        skip = cfg.ignore_too_much & (n_cl >= cfg.max_people) & (~is_first)
        do_match = (~is_first) & (~skip)

        # --- cost matrix over (peak m, cluster slot g<M) ------------------
        G = jnp.minimum(n_cl, cfg.max_people)
        mean = tag_sum[: cfg.max_people] / jnp.maximum(tag_cnt[: cfg.max_people], 1.0)[:, None]
        diff = jnp.linalg.norm(tags[:, None, :] - mean[None, :, :], axis=-1)  # (M, Mp)
        col_valid = jnp.arange(cfg.max_people) < G
        if cfg.use_detection_val:
            base = jnp.minimum(jnp.round(diff) * 100.0, CLIP_COST) - val[:, None]
        else:
            base = jnp.minimum(diff, CLIP_COST)
        # real rows: real cols get base, dummy cols 1e10 (reference pads
        # extra columns with 1e10); dummy (masked-out) rows cost 0 anywhere
        # (munkres zero-pad semantics).
        cost = jnp.where(col_valid[None, :], base, PAD_COST)
        cost = jnp.where(mask[:, None], cost, 0.0)
        # val_k is sorted descending, so masked rows form a prefix: assign
        # only those (huge sequential-iteration saving; see hungarian_prefix).
        n_valid = jnp.sum(mask.astype(jnp.int32))
        # skip the solve entirely on steps that don't match
        n_solve = jnp.where(do_match, n_valid, 0)
        if cfg.assignment == "greedy":
            assign = greedy_assign(cost, n_solve)
        else:
            assign = hungarian_prefix(cost, n_solve)

        safe_assign = jnp.minimum(assign, cfg.max_people - 1)
        matched_diff = jnp.take_along_axis(diff, safe_assign[:, None], axis=1)[:, 0]
        join = (
            do_match
            & mask
            & (assign < G)
            & (matched_diff < cfg.tag_threshold)
        )
        spawn = mask & ((is_first) | (do_match & (~join)))

        # --- joins: assignment is injective, scatter in parallel ----------
        join_slot = jnp.where(join, assign, P)  # P = out-of-bounds -> dropped
        cl_joints = cl_joints.at[join_slot, idx].set(
            joints, mode="drop"
        )
        tag_sum = tag_sum.at[join_slot].add(tags, mode="drop")
        tag_cnt = tag_cnt.at[join_slot].add(1.0, mode="drop")

        # --- spawns: append in peak order ---------------------------------
        rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
        spawn_slot = jnp.where(spawn, n_cl + rank, P)
        spawn_slot = jnp.where(spawn_slot >= P, P, spawn_slot)
        cl_joints = cl_joints.at[spawn_slot, idx].set(joints, mode="drop")
        tag_sum = tag_sum.at[spawn_slot].set(tags, mode="drop")
        tag_cnt = tag_cnt.at[spawn_slot].set(1.0, mode="drop")
        n_cl = jnp.minimum(n_cl + jnp.sum(spawn.astype(jnp.int32)), P)

        return (cl_joints, tag_sum, tag_cnt, n_cl), None

    n_steps = len(cfg.joint_order)
    xs = (
        jnp.arange(n_steps, dtype=jnp.int32),
        order,
        tags_o,
        joints_o,
    )
    (cl_joints, _, _, n_cl), _ = lax.scan(step, init, xs)
    return cl_joints, n_cl


def adjust(people: jnp.ndarray, det: jnp.ndarray) -> jnp.ndarray:
    """Quarter-pixel shift toward the larger neighbor plus +0.5 center
    offset, for every joint with score > 0 (reference ``adjust``,
    ``/root/reference/lib/core/group.py:178-197``)."""
    K, H, W = det.shape
    P = people.shape[0]
    x = people[..., 0]
    y = people[..., 1]
    v = people[..., 2]
    xi = jnp.clip(x.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, H - 1)
    kk = jnp.broadcast_to(jnp.arange(K)[None, :], (P, K))

    def at(yy, xx):
        return det[kk, jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]

    dx = jnp.where(at(yi, xi + 1) > at(yi, xi - 1), 0.25, -0.25)
    dy = jnp.where(at(yi + 1, xi) > at(yi - 1, xi), 0.25, -0.25)
    new_x = x + dx + 0.5
    new_y = y + dy + 0.5
    valid = v > 0
    out = people.at[..., 0].set(jnp.where(valid, new_x, x))
    out = out.at[..., 1].set(jnp.where(valid, new_y, y))
    return out


def refine(people: jnp.ndarray, det: jnp.ndarray, tag: jnp.ndarray) -> jnp.ndarray:
    """Fill missing joints per person from the tag-distance-penalized
    heatmap argmax (reference ``refine``,
    ``/root/reference/lib/core/group.py:199-267``), vmapped over persons."""
    K, H, W = det.shape
    T = tag.shape[-1]
    det_flat = det.reshape(K, H * W)

    def one_person(kp):  # kp: (K, 3+T)
        sel = kp[:, 2] > 0
        xi = jnp.clip(kp[:, 0].astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(kp[:, 1].astype(jnp.int32), 0, H - 1)
        tags_at = tag[jnp.arange(K), yi, xi]  # (K, T)
        cnt = jnp.maximum(jnp.sum(sel), 1)
        prev = jnp.sum(jnp.where(sel[:, None], tags_at, 0.0), axis=0) / cnt  # (T,)

        tt = jnp.sqrt(jnp.sum((tag - prev[None, None, None, :]) ** 2, axis=-1))
        tmp2 = (det - jnp.round(tt)).reshape(K, H * W)
        pos = jnp.argmax(tmp2, axis=1)
        py = pos // W
        px = pos % W
        val = det_flat[jnp.arange(K), pos]

        def at(yy, xx):
            return det[jnp.arange(K), jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]

        fx = px + 0.5 + jnp.where(at(py, px + 1) > at(py, px - 1), 0.25, -0.25)
        fy = py + 0.5 + jnp.where(at(py + 1, px) > at(py - 1, px), 0.25, -0.25)

        fill = (val > 0) & (kp[:, 2] == 0)
        kp = kp.at[:, 0].set(jnp.where(fill, fx, kp[:, 0]))
        kp = kp.at[:, 1].set(jnp.where(fill, fy, kp[:, 1]))
        kp = kp.at[:, 2].set(jnp.where(fill, val, kp[:, 2]))
        # a person slot with no joints at all stays empty
        exists = jnp.any(sel)
        return jnp.where(exists, kp, people_zero)

    people_zero = jnp.zeros((K, 3 + T), jnp.float32)
    return jax.vmap(one_person)(people)


def parse_single(
    det: jnp.ndarray,  # (K, H, W)
    tag: jnp.ndarray,  # (K, H, W, T)
    cfg: StaticGroupCfg,
    with_adjust: bool = True,
    with_refine: bool = True,
):
    """Full decode for one image; returns (people (P,K,3+T), scores (P,),
    n_people)."""
    tag_k, loc_k, val_k = top_k_peaks(
        det, tag, cfg.max_people, cfg.nms_kernel, cfg.nms_padding,
        method=cfg.topk_method,
    )
    people, n_cl = match_by_tag(tag_k, loc_k, val_k, cfg)
    if with_adjust:
        people = adjust(people, det)
    # person score: mean joint score after adjust, before refine
    # (/root/reference/lib/core/group.py:275)
    scores = jnp.mean(people[..., 2], axis=-1)
    if with_refine:
        people = refine(people, det, tag)
    return people, scores, n_cl


@functools.partial(jax.jit, static_argnames=("cfg", "with_adjust", "with_refine",
                                              "tag_layout"))
def parse_batch(det, tag, cfg: StaticGroupCfg, with_adjust=True, with_refine=True,
                tag_layout: str = "hwt"):
    """Batched decode: det (B,K,H,W), tag (B,K,H,W,T) (tag_layout="hwt",
    the ``to_decode_layout`` form) or (B,K,T,H,W) (tag_layout="thw", the
    ``make_infer_fn(decode_layout=True)`` form — preferred on the hot path:
    the T-minor stack and the refine kernel's (B,K,T,H,W) transpose are
    both full-resolution passes with a 2-wide minor dim that this layout
    never materializes).

    Both assignment modes (greedy serving AND exact-Hungarian eval, tag
    dim <= 2) group in one Pallas kernel — batch on the 128 VPU lanes, the
    whole 14-joint sequential chain as in-kernel vector ops, with a
    lane-vectorized exact JV solver for the hungarian mode (bit-identical
    to the XLA scan; see ops/pallas_group.py).  Exact top-k runs as the
    fused NMS+extract kernel (ops/pallas_topk.py) and refinement as the
    batched single-HBM-pass kernel (ops/pallas_refine.py) — all bit-exact,
    so the eval path uses them too."""
    from .pallas_refine import refine_batch

    assert tag_layout in ("hwt", "thw")
    T = tag.shape[2] if tag_layout == "thw" else tag.shape[-1]

    def peaks_batched(det, tag):
        if cfg.topk_method == "exact" and cfg.nms_padding == cfg.nms_kernel // 2:
            from .pallas_topk import top_k_peaks_batch

            return top_k_peaks_batch(det, tag, cfg.max_people, cfg.nms_kernel,
                                     interpret=cfg.interpret,
                                     tag_layout=tag_layout)
        if tag_layout == "thw":  # vmap fallback consumes (K, H, W, T)
            tag = jnp.transpose(tag, (0, 1, 3, 4, 2))
        return jax.vmap(
            lambda d, t: top_k_peaks(
                d, t, cfg.max_people, cfg.nms_kernel, cfg.nms_padding,
                method=cfg.topk_method, interpret=cfg.interpret,
            )
        )(det, tag)

    tag_k, loc_k, val_k = peaks_batched(det, tag)
    tag_k = tag_k.astype(jnp.float32)
    loc_k = loc_k.astype(jnp.float32)
    val_k = val_k.astype(jnp.float32)
    # the Pallas kernel covers both assignment modes for T<=2 (greedy
    # serving and the lane-vectorized exact Hungarian); gathered peaks are
    # tiny, so grouping runs in fp32 even when the maps are bf16
    if T <= 2 and cfg.max_people == val_k.shape[-1]:
        from .pallas_group import match_by_tag_batch_pallas

        people, n_cl = match_by_tag_batch_pallas(tag_k, loc_k, val_k, cfg)
    else:
        people, n_cl = jax.vmap(
            lambda tk, lk, vk: match_by_tag(tk, lk, vk, cfg)
        )(tag_k, loc_k, val_k)
    if with_adjust:
        people = jax.vmap(adjust)(people, det)
    scores = jnp.mean(people[..., 2], axis=-1)
    if with_refine:
        people = refine_batch(people, det, tag, interpret=cfg.interpret,
                              tag_layout=tag_layout)
    return people, scores, n_cl

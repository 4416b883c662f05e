"""Missing-joint refinement as a single-HBM-pass Pallas TPU kernel.

``ops.group.refine`` (reference semantics:
``/root/reference/lib/core/group.py:199-267``) computes, for every person
slot p and joint k, ``argmax_x det_k(x) - round(||tag_k(x) - prev_p||)``.
The vmapped XLA formulation re-reads the full (K, H, W[, T]) det/tag maps
once per person slot — P=30 full-map passes (~22 ms at b64/224^2, the
largest single piece of the eval decode after the Hungarian).

This kernel makes one pass: each grid step DMAs one (image, joint) det/tag
plane into VMEM and computes the penalized argmax for ALL person slots from
VMEM (the per-person means live in SMEM).  HBM traffic drops P-fold; the
extra VPU work (P elementwise passes over a 200 KB plane) is cheap.

The argmax is exact, including the reference's flat row-major first-max
tie-break (min flat index among maxima).  The gather/quarter-pixel/fill
epilogue stays in XLA (`refine_batch` below) and is shared with the
reference-semantics path; bit-parity with ``group.refine`` is tested in
tests/test_pallas_refine.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import resolve_interpret

# python int (not a jnp scalar): pallas kernels may not capture tracers
HUGE_I = 2**31 - 1


def _refine_kernel(need_ref, prev_ref, det_ref, tag_ref, pos_ref, scr_ref, *,
                   P, H, W, T, K):
    """Grid step (b, k): penalized argmax for the image's person slots.

    need_ref: (1, K, P) i32 SMEM — 1 where the epilogue will consume the
        argmax, i.e. the joint is MISSING (score 0) on a live person.  The
        reference only fills missing joints (group.py:199-267), so the
        argmax for already-detected joints is discarded work; predicating
        each (person, joint) pair on it skips most full-plane passes on
        real scenes (measured 31.9 -> 13.0 ms/b32 at 448^2, PERF_NOTES
        round-4).  Skipped slots are written as 0 (masked by the caller).
    prev_ref: (1, P, T) f32 SMEM — per-person mean tags
    det_ref:  (1, 1, H, W) f32 VMEM
    tag_ref:  (1, 1, T, H, W) f32 VMEM
    pos_ref:  (1, K, P) i32 VMEM out — flat row-major argmax index; the
        block spans all K (Mosaic needs ≥8-divisible or full trailing
        dims) and stays resident across the inner k grid steps.
    scr_ref:  (1, P) i32 VMEM scratch — accumulates the row so the
        predicated region can write one-hot updates.
    """
    k = pl.program_id(1)
    x = det_ref[0, 0]  # (H, W)
    idx = (
        lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    iota_sp = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    scr_ref[...] = jnp.zeros((1, P), jnp.int32)

    # all-vector: (1,1) keepdims reductions + one-hot accumulation into a
    # (1, P) register — per-slot scalar stores would serialize on ~0.5 us
    # vector->scalar round-trips
    def body(p, carry):
        @pl.when(need_ref[0, k, p] > 0)
        def _():
            if T == 1:
                tt = jnp.abs(tag_ref[0, 0, 0] - prev_ref[0, p, 0])
            else:
                acc = jnp.zeros((H, W), jnp.float32)
                for t in range(T):
                    d = tag_ref[0, 0, t] - prev_ref[0, p, t]
                    acc = acc + d * d
                tt = jnp.sqrt(acc)
            penal = x - jnp.round(tt)
            mv = jnp.max(jnp.max(penal, axis=1, keepdims=True), axis=0,
                         keepdims=True)  # (1, 1)
            cand = jnp.where(penal == mv, idx, HUGE_I)
            pos = jnp.min(jnp.min(cand, axis=1, keepdims=True), axis=0,
                          keepdims=True)  # (1, 1)
            scr_ref[...] = jnp.where(iota_sp == p, pos, scr_ref[...])
        return carry

    lax.fori_loop(0, P, body, jnp.int32(0))
    pos_ref[0, k] = scr_ref[0]


def refine_argmax_pallas(need, prev, det, tag_t, interpret=None):
    """need (B,K,P) i32, prev (B,P,T) f32, det (B,K,H,W) f32,
    tag_t (B,K,T,H,W) f32 -> pos (B,K,P) i32 (flat row-major argmax of
    det - round(||tag-prev||); slots with need == 0 are written as 0)."""
    B, K, H, W = det.shape
    P, T = prev.shape[1], prev.shape[2]
    kern = functools.partial(_refine_kernel, P=P, H=H, W=W, T=T, K=K)
    return pl.pallas_call(
        kern,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, K, P), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P, T), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, H, W), lambda b, k: (b, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, H, W), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, P), lambda b, k: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, P), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.int32)],
        interpret=resolve_interpret(interpret),
    )(need, prev, det, tag_t)


def refine_batch(people, det, tag, interpret=None, tag_layout: str = "hwt"):
    """Batched ``group.refine``: people (B,P,K,3+T), det (B,K,H,W),
    tag (B,K,H,W,T) (tag_layout="hwt") or (B,K,T,H,W) ("thw" — the kernel's
    native layout: no full-resolution transpose pass) -> refined people.
    Same semantics, one HBM pass."""
    B, P, K, _ = people.shape
    H, W = det.shape[-2:]
    T = tag.shape[2] if tag_layout == "thw" else tag.shape[-1]
    det = det.astype(jnp.float32)
    tag = tag.astype(jnp.float32)

    # ---- per-person mean tag at detected joints (tiny, XLA) ----
    kp_v = people[..., 2]  # (B, P, K)
    sel = kp_v > 0
    xi = jnp.clip(people[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(people[..., 1].astype(jnp.int32), 0, H - 1)
    kk = jnp.broadcast_to(jnp.arange(K)[None, None, :], (B, P, K))
    bb = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, P, K))
    if tag_layout == "thw":
        # advanced indices split by the slice -> broadcast dims first:
        # (B, P, K, T)
        tags_at = tag[bb, kk, :, yi, xi]
    else:
        tags_at = tag[bb, kk, yi, xi]  # (B, P, K, T)
    cnt = jnp.maximum(jnp.sum(sel, axis=-1), 1)  # (B, P)
    prev = (
        jnp.sum(jnp.where(sel[..., None], tags_at, 0.0), axis=2)
        / cnt[..., None]
    )  # (B, P, T)

    # the argmax is only consumed where a live person is MISSING the joint
    # (fill = val > 0 & kp_v == 0 below); predicate the kernel on exactly
    # those (person, joint) pairs
    exists = jnp.any(sel, axis=-1)  # (B, P)
    need = (exists[..., None] & (~sel)).astype(jnp.int32)  # (B, P, K)

    # ---- penalized argmax, one pass over det/tag (Pallas) ----
    if tag_layout == "thw":
        tag_t = tag  # already the kernel layout
    else:
        tag_t = jnp.transpose(tag, (0, 1, 4, 2, 3))  # (B, K, T, H, W)
    pos = refine_argmax_pallas(
        jnp.transpose(need, (0, 2, 1)), prev, det, tag_t, interpret
    )  # (B, K, P)
    pos = jnp.transpose(pos, (0, 2, 1))  # (B, P, K)
    # skipped slots carry pos 0 (in range); results are masked by `fill`

    # ---- gather + quarter-pixel + fill epilogue (tiny, XLA) ----
    py = pos // W
    px = pos % W
    val = det[bb, kk, py, px]

    def at(yy, xx):
        return det[bb, kk, jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]

    fx = px + 0.5 + jnp.where(at(py, px + 1) > at(py, px - 1), 0.25, -0.25)
    fy = py + 0.5 + jnp.where(at(py + 1, px) > at(py - 1, px), 0.25, -0.25)

    fill = (val > 0) & (kp_v == 0)
    out = people.at[..., 0].set(jnp.where(fill, fx, people[..., 0]))
    out = out.at[..., 1].set(jnp.where(fill, fy, people[..., 1]))
    out = out.at[..., 2].set(jnp.where(fill, val, people[..., 2]))
    return jnp.where(exists[..., None, None], out, 0.0)

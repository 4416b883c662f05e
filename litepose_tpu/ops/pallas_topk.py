"""Fused NMS + exact top-M peak extraction as one Pallas TPU kernel.

The eval decode needs *exact* top-M (bit-identical to ``lax.top_k``,
including first-occurrence tie order) over each NMS-suppressed heatmap
plane.  XLA's TopK custom call costs ~16.5 ms/b64 even with the two-level
chunked formulation (``ops.nms.chunked_top_k``), plus a separate NMS pass.

This kernel does both in one VMEM residency per (image, joint) plane:

1. separable maxpool-equality NMS (k shifted row-maxes then column-maxes,
   as in ops/pallas_nms.py) — the suppressed plane never touches HBM;
2. row-hierarchical iterative extraction: a per-row max vector (H,1) is
   maintained in VMEM scratch, so each of the M extractions costs one
   (H,1) reduce + one (1,W) row rescan + two single-row updates instead of
   a full-plane pass.  M=30 extractions ≈ a few thousand VPU ops per plane.

Tie semantics match ``lax.top_k`` exactly: the global max resolves to the
lowest flat row-major index (lowest row, then lowest column).  Exhausted
planes keep yielding the remaining largest values (zeros from suppression)
in flat-index order — identical to top_k of the suppressed plane.
Parity (values AND indices) is tested in tests/test_pallas_topk.py.

Reference context: maxpool NMS + topk + gather on host,
``/root/reference/lib/core/group.py:131-176``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import resolve_interpret

NEG = -3.0e38
HUGE_I = 2**31 - 1


def _nms_topk_kernel_vec(x_ref, val_ref, pos_ref, xs, *, H, W, M, KB, r):
    """Grid step (b, j): NMS + exact top-M, VECTORIZED across the KB planes.

    The per-plane variant below issues its extraction ops plane-by-plane —
    at M=30 that is ~10^5 small vector ops per decode and the kernel is
    instruction-issue-bound, not compute-bound (measured 108 us/step at
    448^2 with KB=4, ~60% in sub-(H,1) op issue).  Here every extraction
    step runs as (KB, H)/(KB, W)/(KB, M) ops covering all planes of the
    chunk at once, and the VMEM budget is sized so KB == K (all 14 joint
    planes in one grid step at 448^2): small-op count drops ~KB-fold.
    Results are bit-identical to the per-plane kernel (same reductions,
    same tie arithmetic, per-plane lanes independent)."""
    j = pl.program_id(1)
    X = x_ref[0].astype(jnp.float32)  # (KB, H, W)

    # ---- separable maxpool-equality NMS, all planes at once ----
    m = X
    for d in range(1, r + 1):
        up = jnp.concatenate([X[:, d:], jnp.full((KB, d, W), NEG, X.dtype)], axis=1)
        dn = jnp.concatenate([jnp.full((KB, d, W), NEG, X.dtype), X[:, :-d]], axis=1)
        m = jnp.maximum(m, jnp.maximum(up, dn))
    mm = m
    for d in range(1, r + 1):
        lf = jnp.concatenate([m[:, :, d:], jnp.full((KB, H, d), NEG, m.dtype)], axis=2)
        rt = jnp.concatenate([jnp.full((KB, H, d), NEG, m.dtype), m[:, :, :-d]], axis=2)
        mm = jnp.maximum(mm, jnp.maximum(lf, rt))
    xs[...] = jnp.where(mm == X, X, jnp.zeros_like(X))

    # ---- row-hierarchical exact top-M (read-only plane; see below) ----
    RM = jnp.max(xs[...], axis=2)  # (KB, H) per-row maxes
    riota = lax.broadcasted_iota(jnp.int32, (KB, H), 1)
    ciota = lax.broadcasted_iota(jnp.int32, (KB, W), 1)
    iota_sm = lax.broadcasted_iota(jnp.int32, (KB, M), 1)

    vals = jnp.full((KB, M), NEG, jnp.float32)
    poss = jnp.zeros((KB, M), jnp.int32)
    for i in range(M):
        mv = jnp.max(RM, axis=1, keepdims=True)  # (KB, 1)
        rfirst = jnp.min(
            jnp.where(RM == mv, riota, HUGE_I), axis=1, keepdims=True
        )  # (KB, 1) first max row per plane (lax.top_k tie order)
        roh = riota == rfirst  # (KB, H)
        # mask built in fp32 at (KB, H, 1): Mosaic only supports minor-dim
        # insertion (the [:, :, None] reshape) for 32-bit types, not i1
        roh3 = jnp.where(roh, 1.0, 0.0)[:, :, None]  # (KB, H, 1) f32
        row = jnp.sum(xs[...] * roh3, axis=1)  # (KB, W) one-hot row gather
        if i > 0:
            # cells of these rows already extracted (slots < i): value ties
            # would otherwise re-resolve to the same column
            flat_ids = rfirst * W + ciota  # (KB, W)
            taken = jnp.any(
                (poss[:, :, None] == flat_ids[:, None, :])
                & (iota_sm[:, :, None] < i),
                axis=1,
            )  # (KB, W)
            row = jnp.where(taken, NEG, row)
        cfirst = jnp.min(
            jnp.where(row == mv, ciota, HUGE_I), axis=1, keepdims=True
        )  # (KB, 1)
        coh = ciota == cfirst  # (KB, W)
        vals = jnp.where(iota_sm == i, mv, vals)
        poss = jnp.where(iota_sm == i, rfirst * W + cfirst, poss)
        row_new = jnp.where(coh, NEG, row)
        RM = jnp.where(roh, jnp.max(row_new, axis=1, keepdims=True), RM)
    val_ref[0, pl.ds(j * KB, KB)] = vals
    pos_ref[0, pl.ds(j * KB, KB)] = poss


def _nms_topk_kernel(x_ref, val_ref, pos_ref, xs, rm, *, H, W, M, KB, r,
                     gather: str = "sum"):
    """Grid step (b, j): NMS + exact top-M for a chunk of KB joint planes
    (chunked so the VMEM block + scratch fit at any decode resolution —
    project2image evals run at up to ~512x704 per plane).

    The extraction is all-vector: reductions stay as (1,1) keepdims
    vectors, "indexing" the selected row/column is one-hot masked
    arithmetic, and results accumulate into (1, M) registers written once
    per plane.  No reduce->address scalar round-trips — the variant that
    dynamic-slices the selected row via a scalar index serializes on the
    ~0.7 us vector->scalar readback and runs ~1.4x slower (19 vs 13.8 ms
    at b64) despite touching less data."""
    j = pl.program_id(1)
    for k in range(KB):
        # ---- separable maxpool-equality NMS (fp32 in VMEM) ----
        x = x_ref[0, k].astype(jnp.float32)  # (H, W)
        m = x
        for d in range(1, r + 1):
            up = jnp.concatenate([x[d:], jnp.full((d, W), NEG, x.dtype)], axis=0)
            dn = jnp.concatenate([jnp.full((d, W), NEG, x.dtype), x[:-d]], axis=0)
            m = jnp.maximum(m, jnp.maximum(up, dn))
        mm = m
        for d in range(1, r + 1):
            lf = jnp.concatenate([m[:, d:], jnp.full((H, d), NEG, m.dtype)], axis=1)
            rt = jnp.concatenate([jnp.full((H, d), NEG, m.dtype), m[:, :-d]], axis=1)
            mm = jnp.maximum(mm, jnp.maximum(lf, rt))
        xs[k] = jnp.where(mm == x, x, jnp.zeros_like(x))
        rm[k] = jnp.max(xs[k], axis=1, keepdims=True)  # (H, 1)

    # ---- row-hierarchical exact top-M, all-vector ----
    # The plane stays READ-ONLY during extraction: already-extracted cells
    # are re-masked from the recorded flat positions ((M, W) compares)
    # instead of NEG-writing the plane ((H, W) pass per extraction) — one
    # full-plane op per extraction (the row gather) instead of two.
    riota = lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    riota_t = lax.broadcasted_iota(jnp.int32, (1, H), 1)
    ciota = lax.broadcasted_iota(jnp.int32, (1, W), 1)
    iota_sm = lax.broadcasted_iota(jnp.int32, (1, M), 1)

    for k in range(KB):
        plane = xs[k]
        rmk = rm[k]
        vals = jnp.full((1, M), NEG, jnp.float32)
        poss = jnp.zeros((1, M), jnp.int32)
        for i in range(M):
            mv = jnp.max(rmk, axis=0, keepdims=True)  # (1, 1)
            rfirst = jnp.min(
                jnp.where(rmk == mv, riota, HUGE_I), axis=0, keepdims=True
            )  # first max row (lowest index: lax.top_k tie order)
            roh = riota == rfirst  # (H, 1)
            if gather == "dot":
                # one-hot row select on the MXU: (1,H)x(H,W) fp32 matvec.
                # NOT bit-exact on hardware (bf16-split MXU passes round by
                # an ulp on some values — measured on-chip, round 4); keep
                # only for throughput experiments, never the exact path.
                roh_t = (riota_t == rfirst).astype(jnp.float32)  # (1, H)
                row = jax.lax.dot_general(
                    roh_t, plane, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                row = jnp.sum(jnp.where(roh, plane, 0.0), axis=0, keepdims=True)
            if i > 0:
                # cells of this row already extracted (slots < i): value
                # ties would otherwise re-resolve to the same column
                flat_ids = rfirst * W + ciota  # (1, W)
                taken = jnp.any(
                    (poss[:, :, None] == flat_ids[:, None, :])
                    & (iota_sm[:, :, None] < i),
                    axis=1,
                )  # (1, W)
                row = jnp.where(taken, NEG, row)
            cfirst = jnp.min(
                jnp.where(row == mv, ciota, HUGE_I), axis=1, keepdims=True
            )
            coh = ciota == cfirst  # (1, W)
            vals = jnp.where(iota_sm == i, mv, vals)
            poss = jnp.where(iota_sm == i, rfirst * W + cfirst, poss)
            row_new = jnp.where(coh, NEG, row)
            rmk = jnp.where(roh, jnp.max(row_new, axis=1, keepdims=True), rmk)
        val_ref[0, j * KB + k] = vals[0]
        pos_ref[0, j * KB + k] = poss[0]


@functools.partial(
    jax.jit,
    static_argnames=("max_people", "nms_kernel", "_vmem_budget", "_gather",
                     "_interp"),
)
def nms_topk_pallas(det, max_people: int, nms_kernel: int = 5,
                    _vmem_budget: int = 48 * 2**20, _gather: str = "vec",
                    _interp=None):
    """det (B, K, H, W) (f32 or bf16) -> (val (B,K,M) f32, pos (B,K,M) i32).

    Equivalent to ``heatmap_nms(det, k, k//2)`` (fp32) followed by
    ``lax.top_k`` over the flattened plane — bit-identical, including
    first-occurrence tie order.

    _gather selects the kernel variant:
      'vec' (default): extraction vectorized across the chunk's KB planes
        — the production path (the per-plane variants are issue-bound;
        PERF_NOTES round-4).
      'sum': per-plane loop, VPU masked-reduction row select — exact,
        kept as the measurement baseline.
      'dot': per-plane loop, MXU fp32 matvec row select — measured faster
        than 'sum' (12.50 vs 14.71 ms at 448^2/b32) but NOT bit-exact on
        hardware (the MXU computes fp32 through bf16-split passes whose
        reconstruction can be off by an ulp, verified on-chip, round-4);
        never the exact path.
    """
    B, K, H, W = det.shape
    M = max_people
    # planes per grid step: the double-buffered input block + fp32 scratch
    # must fit VMEM at any decode resolution (project2image evals reach
    # ~512x704 planes).  ~4x per-plane residency (pipelined input blocks +
    # suppressed-plane scratch); the 48 MB budget of the 128 MB v5e VMEM
    # keeps KB = 14 (all joint planes in one step) through 448^2; larger
    # planes chunk (512x704 runs at KB = 8) with identical results.
    per_plane = H * W * 4
    KB = max(1, min(K, _vmem_budget // (4 * per_plane)))
    n_chunks = -(-K // KB)
    Kp = n_chunks * KB
    if Kp != K:  # zero-pad; padded planes' outputs are sliced off below
        det = jnp.pad(det, ((0, 0), (0, Kp - K), (0, 0), (0, 0)))
    if _gather == "vec":
        kern = functools.partial(
            _nms_topk_kernel_vec, H=H, W=W, M=M, KB=KB, r=nms_kernel // 2)
        scratch = [pltpu.VMEM((KB, H, W), jnp.float32)]
    else:
        kern = functools.partial(
            _nms_topk_kernel, H=H, W=W, M=M, KB=KB, r=nms_kernel // 2,
            gather=_gather,
        )
        scratch = [pltpu.VMEM((KB, H, W), jnp.float32),
                   pltpu.VMEM((KB, H, 1), jnp.float32)]
    val, pos = pl.pallas_call(
        kern,
        grid=(B, n_chunks),
        # Mosaic's default scoped-VMEM limit is 16 MB; the actual scoped
        # need scales with the block: double-buffered (KB,H,W) input +
        # suppressed-plane scratch + the NMS shift temporaries (Mosaic
        # materializes the concats) — measured 85.62M requested at
        # KB=14/448^2 (~7.7 plane-sets).  Scale the limit with the block
        # (9 plane-sets, floor at the 16 MB default) instead of pinning a
        # v5e-class constant, so small-VMEM parts (v2/v3: 16 MB) still
        # accept the small-KB configurations that fit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(16 * 2**20, 9 * KB * per_plane)),
        in_specs=[
            pl.BlockSpec((1, KB, H, W), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            # full-(Kp, M) blocks revisited across j; rows indexed j*KB+k
            pl.BlockSpec((1, Kp, M), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, M), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Kp, M), jnp.float32),
            jax.ShapeDtypeStruct((B, Kp, M), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=resolve_interpret(_interp),
    )(det)
    return val[:, :K], pos[:, :K]


def top_k_peaks_batch(det, tag, max_people: int, nms_kernel: int = 5,
                      interpret=None, tag_layout: str = "hwt"):
    """Batched exact peak extraction: det (B,K,H,W), tag (B,K,H,W,T)
    (tag_layout="hwt") or (B,K,T,H,W) ("thw") ->
    (tag_k (B,K,M,T), loc_k (B,K,M,2) f32 xy, val_k (B,K,M) f32).

    Fused-kernel equivalent of ``jax.vmap(top_k_peaks)`` with
    method='exact' and the torch-default padding (k//2)."""
    B, K, H, W = det.shape
    val_k, ind = nms_topk_pallas(det, max_people, nms_kernel, _interp=interpret)
    if tag_layout == "thw":
        T = tag.shape[2]
        tag_flat = tag.reshape(B, K, T, H * W)
        tag_k = jnp.transpose(
            jnp.take_along_axis(tag_flat, ind[:, :, None, :], axis=3),
            (0, 1, 3, 2),
        )  # (B, K, M, T)
    else:
        T = tag.shape[-1]
        tag_flat = tag.reshape(B, K, H * W, T)
        tag_k = jnp.take_along_axis(tag_flat, ind[..., None], axis=2)
    x = (ind % W).astype(jnp.float32)
    y = (ind // W).astype(jnp.float32)
    loc_k = jnp.stack([x, y], axis=3)
    return tag_k, loc_k, val_k

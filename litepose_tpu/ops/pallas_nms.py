"""Pallas TPU kernel: fused maxpool-equality NMS.

XLA lowers the 5x5 ``reduce_window`` + equality + multiply chain of heatmap
NMS at ~5x off the bandwidth roofline (~4.3 ms for a (128,14,224,224)
decode batch).  This kernel computes the same suppression in one VMEM pass
per (image, joint) plane using the separability of max-pooling: k shifted
row-maxes, then k shifted column-maxes over the row-max, then
``det * (max == det)`` — ~2k/2 VPU ops per element instead of k^2, with a
single HBM read and write.

Exact equivalence with ``ops.nms.heatmap_nms`` (torch ``MaxPool2d(k, 1,
k//2)`` semantics with -inf borders) is tested in tests/test_topk.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38


def _nms_kernel(x_ref, o_ref, *, PB, H, W, r):
    # Mosaic on v5e has no bf16 vector compare; upcasting is VMEM-local so
    # the HBM-traffic win of bf16 inputs is kept.
    x = x_ref[:].astype(jnp.float32)  # (PB, H, W)
    # row direction: max over [i-r, i+r]
    m = x
    for d in range(1, r + 1):
        up = jnp.concatenate([x[:, d:], jnp.full((PB, d, W), NEG, x.dtype)], axis=1)
        dn = jnp.concatenate([jnp.full((PB, d, W), NEG, x.dtype), x[:, :-d]], axis=1)
        m = jnp.maximum(m, jnp.maximum(up, dn))
    # column direction over the row-max
    mm = m
    for d in range(1, r + 1):
        lf = jnp.concatenate([m[:, :, d:], jnp.full((PB, H, d), NEG, m.dtype)], axis=2)
        rt = jnp.concatenate([jnp.full((PB, H, d), NEG, m.dtype), m[:, :, :-d]], axis=2)
        mm = jnp.maximum(mm, jnp.maximum(lf, rt))
    o_ref[:] = jnp.where(mm == x, x, jnp.zeros_like(x)).astype(o_ref.dtype)


def heatmap_nms_pallas(det: jnp.ndarray, kernel: int = 5) -> jnp.ndarray:
    """det: (..., H, W) -> suppressed heatmaps (window `kernel`, stride 1,
    pad kernel//2). Equivalent to ``heatmap_nms(det, kernel, kernel // 2)``."""
    shape = det.shape
    H, W = shape[-2], shape[-1]
    planes = 1
    for s in shape[:-2]:
        planes *= s
    x = det.reshape(planes, H, W)
    # batch several planes per grid step: fewer, larger DMAs
    PB = 1
    for cand in (16, 8, 4, 2):
        if planes % cand == 0 and cand * H * W * det.dtype.itemsize <= 2 * 1024 * 1024:
            PB = cand
            break
    out = pl.pallas_call(
        functools.partial(_nms_kernel, PB=PB, H=H, W=W, r=kernel // 2),
        grid=(planes // PB,),
        in_specs=[
            pl.BlockSpec((PB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((PB, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((planes, H, W), det.dtype),
    )(x)
    return out.reshape(shape)

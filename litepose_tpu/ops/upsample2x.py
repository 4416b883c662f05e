"""Exact-2x bilinear upsample reformulations — measured and REFUTED.

``jax.image.resize(..., method='bilinear')`` at an exact 2x scale reduces
to a fixed 2-tap filter: output row 2j is ``0.25*in[j-1] + 0.75*in[j]``
and row 2j+1 is ``0.75*in[j] + 0.25*in[j+1]`` (edges clamped), likewise
along columns.  Three hand formulations of that filter were built here and
A/B'd on chip against XLA's resize lowering over the eval protocol's 42
projected planes (b32, 224->448, PERF_NOTES round-4):

  * ``upsample2x_bilinear`` — elementwise passes + stack/reshape
    interleave ("pure bandwidth" on paper): XLA-TPU lowers the interleave
    catastrophically (glue 15.4 -> 121.5 ms/b32);
  * ``upsample2x_deconv`` — separable stride-2 depthwise transposed conv:
    23.9 ms vs resize's 8.0;
  * ``upsample2x_matmul`` — MXU interpolation-matrix matmuls
    (precision=HIGHEST): 16.0 ms vs 8.0.

**XLA's ``jax.image.resize`` wins and stays the production path**
(core/inference.py).  All variants match it to one ulp
(tests/test_inference_pipeline.py::test_upsample2x_matches_jax_resize);
they are kept as the measured record so the "resize must be the slow
part" hypothesis is not re-tried without new information.  Reference
context: the PROJECT2IMAGE step,
``/root/reference/lib/core/inference.py:98-106``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """[a0, b0, a1, b1, ...] along ``axis`` (a, b same shape)."""
    stacked = jnp.stack([a, b], axis=axis + 1 if axis >= 0 else a.ndim + axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x half-pixel bilinear along one axis: out[2j] = .25 prev + .75 cur,
    out[2j+1] = .75 cur + .25 next (clamped edges)."""
    cur = x
    prev = jnp.concatenate(
        [jnp.take(x, jnp.asarray([0]), axis=axis),
         jnp.take(x, jnp.arange(x.shape[axis] - 1), axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jnp.take(x, jnp.arange(1, x.shape[axis]), axis=axis),
         jnp.take(x, jnp.asarray([x.shape[axis] - 1]), axis=axis)], axis=axis)
    even = cur * 0.75 + prev * 0.25
    odd = cur * 0.75 + nxt * 0.25
    return _interleave(even, odd, axis)


def upsample2x_bilinear(x: jnp.ndarray, axes=(-2, -1)) -> jnp.ndarray:
    """Double the extent of ``axes`` (default: trailing H, W), equivalent to
    ``jax.image.resize`` bilinear at exact scale 2 (half-pixel centers,
    align_corners=False) up to one ulp.  Pass ``axes=(1, 2)`` for NHWC.

    NOTE (measured, round-4): XLA-TPU lowers the stack+reshape interleave
    catastrophically (eval glue 15.4 -> 121.5 ms/b32); this form is kept as
    the readable spec and for CPU use.  The production path is
    ``jax.image.resize`` in ``core/inference.py`` (8.0 ms);
    :func:`upsample2x_deconv` is a refuted alternative (23.9 ms)."""
    for ax in axes:
        x = _up2_axis(x, ax)
    return x


# 4-tap stride-2 transposed-conv kernel == 2x half-pixel bilinear:
# out[n] = sum_j in[j] * k[n - 2j], k[-1..2] = [.25, .75, .75, .25]
_K4 = (0.25, 0.75, 0.75, 0.25)


def upsample2x_deconv(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C, 2H, 2W) bilinear (half-pixel) via separable
    stride-2 depthwise transposed convolutions + edge-clamp correction.

    Interior outputs are the transposed conv directly; the first/last
    row/col see a zero pad where the clamped edge value belongs, adding
    0.25 * edge — corrected with one scaled-slice concat per axis.  Matches
    ``jax.image.resize(..., 'bilinear')`` to one ulp (same 2-tap weights;
    pinned in tests)."""
    import numpy as np

    B, C, H, W = x.shape
    kh = jnp.asarray(np.asarray(_K4, np.float32).reshape(1, 1, 4, 1), x.dtype)
    kw = jnp.asarray(np.asarray(_K4, np.float32).reshape(1, 1, 1, 4), x.dtype)
    kh = jnp.broadcast_to(kh, (C, 1, 4, 1)).reshape(C, 1, 4, 1)
    kw = jnp.broadcast_to(kw, (C, 1, 1, 4)).reshape(C, 1, 1, 4)
    dn = jax.lax.conv_dimension_numbers(x.shape, (C, 1, 4, 1),
                                        ("NCHW", "OIHW", "NCHW"))
    # lhs_dilation=2 turns the conv into the stride-2 transposed conv;
    # padding (2, 2) yields exactly 2H outputs with taps n-2j in [-1, 2]
    y = jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding=((2, 2), (0, 0)),
        lhs_dilation=(2, 1), dimension_numbers=dn, feature_group_count=C)
    # clamp correction: out[0] lost 0.25*in[-1 -> in[0]], out[-1] likewise
    first = y[:, :, :1] + 0.25 * x[:, :, :1]
    last = y[:, :, -1:] + 0.25 * x[:, :, -1:]
    y = jnp.concatenate([first, y[:, :, 1:-1], last], axis=2)
    dn = jax.lax.conv_dimension_numbers(y.shape, (C, 1, 1, 4),
                                        ("NCHW", "OIHW", "NCHW"))
    z = jax.lax.conv_general_dilated(
        y, kw, window_strides=(1, 1), padding=((0, 0), (2, 2)),
        lhs_dilation=(1, 2), dimension_numbers=dn, feature_group_count=C)
    first = z[:, :, :, :1] + 0.25 * y[:, :, :, :1]
    last = z[:, :, :, -1:] + 0.25 * y[:, :, :, -1:]
    return jnp.concatenate([first, z[:, :, :, 1:-1], last], axis=3)


def upsample2x_deconv_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C); NHWC twin of
    :func:`upsample2x_deconv` (same taps, same edge correction)."""
    import numpy as np

    B, H, W, C = x.shape
    kh = jnp.broadcast_to(
        jnp.asarray(np.asarray(_K4, np.float32).reshape(4, 1, 1, 1), x.dtype),
        (4, 1, 1, C))
    kw = jnp.broadcast_to(
        jnp.asarray(np.asarray(_K4, np.float32).reshape(1, 4, 1, 1), x.dtype),
        (1, 4, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, (4, 1, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding=((2, 2), (0, 0)),
        lhs_dilation=(2, 1), dimension_numbers=dn, feature_group_count=C)
    first = y[:, :1] + 0.25 * x[:, :1]
    last = y[:, -1:] + 0.25 * x[:, -1:]
    y = jnp.concatenate([first, y[:, 1:-1], last], axis=1)
    dn = jax.lax.conv_dimension_numbers(y.shape, (1, 4, 1, C),
                                        ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        y, kw, window_strides=(1, 1), padding=((0, 0), (2, 2)),
        lhs_dilation=(1, 2), dimension_numbers=dn, feature_group_count=C)
    first = z[:, :, :1] + 0.25 * y[:, :, :1]
    last = z[:, :, -1:] + 0.25 * y[:, :, -1:]
    return jnp.concatenate([first, z[:, :, 1:-1], last], axis=2)


def _up2_matrix(n: int):
    """(2n, n) sparse bilinear row-upsample matrix (half-pixel, clamped):
    row 2j = .25 e[j-1] + .75 e[j]; row 2j+1 = .75 e[j] + .25 e[j+1]."""
    import numpy as np

    A = np.zeros((2 * n, n), np.float32)
    j = np.arange(n)
    A[2 * j, j] += 0.75
    A[2 * j, np.maximum(j - 1, 0)] += 0.25
    A[2 * j + 1, j] += 0.75
    A[2 * j + 1, np.minimum(j + 1, n - 1)] += 0.25
    return A


def upsample2x_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C, 2H, 2W) bilinear as two MXU matmuls with the
    constant (2H, H)/(2W, W) interpolation matrices.  Each output is the
    two-tap combination plus exact-zero products, so values match the
    2-tap formula up to MXU fp32 rounding (~1 ulp; the MXU computes fp32
    through bf16-split passes)."""
    from jax import lax

    B, C, H, W = x.shape
    A = jnp.asarray(_up2_matrix(H))
    Bm = jnp.asarray(_up2_matrix(W))
    y = jnp.einsum("oh,bchw->bcow", A, x, precision=lax.Precision.HIGHEST)
    return jnp.einsum("pw,bcow->bcop", Bm, y, precision=lax.Precision.HIGHEST)


def upsample2x_matmul_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C); NHWC twin of
    :func:`upsample2x_matmul`."""
    from jax import lax

    B, H, W, C = x.shape
    A = jnp.asarray(_up2_matrix(H))
    Bm = jnp.asarray(_up2_matrix(W))
    y = jnp.einsum("oh,bhwc->bowc", A, x, precision=lax.Precision.HIGHEST)
    return jnp.einsum("pw,bowc->bopc", Bm, y, precision=lax.Precision.HIGHEST)

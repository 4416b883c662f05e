"""Parity: fused Pallas NMS+top-k vs heatmap_nms + lax.top_k (tie order too)."""

import numpy as np
import pytest

# interpret-mode Pallas parity is minutes-slow on the 1-core CPU host;
# tests/test_pallas_smoke.py keeps a fast per-kernel subset in the default run
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from jax import lax

from litepose_tpu.ops.nms import heatmap_nms, top_k_peaks
from litepose_tpu.ops.pallas_topk import nms_topk_pallas, top_k_peaks_batch


@pytest.mark.parametrize("kernel", [3, 5])
# 'vec' is production; 'sum' (per-plane loop) is the documented exactness
# measurement baseline and must stay verified alongside it (ADVICE r4)
@pytest.mark.parametrize("gather", ["vec", "sum"])
def test_nms_topk_matches_xla(kernel, gather):
    rng = np.random.default_rng(0)
    B, K, H, W, M = 2, 3, 48, 64, 10
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    # exact ties at several spots
    det[0, 0, 5, 7] = det[0, 0, 20, 3] = det[0, 0, 40, 50] = 4.0
    det[1, 2] = 0.0  # plane with no positive peaks
    x = jnp.asarray(det)

    val, pos = nms_topk_pallas(x, M, kernel, _gather=gather)
    sup = heatmap_nms(x, kernel, kernel // 2).reshape(B, K, H * W)
    want_v, want_i = lax.top_k(sup, M)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(want_i))


def test_nms_topk_bf16_input():
    rng = np.random.default_rng(1)
    B, K, H, W, M = 1, 2, 32, 32, 6
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    x16 = jnp.asarray(det).astype(jnp.bfloat16)
    val, pos = nms_topk_pallas(x16, M, 5)
    x32 = x16.astype(jnp.float32)
    sup = heatmap_nms(x32, 5, 2).reshape(B, K, H * W)
    want_v, want_i = lax.top_k(sup, M)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(want_i))


def test_nms_topk_chunked_planes():
    """Plane-chunked grid (big-resolution VMEM path): force KB < K with a
    tiny budget and check parity incl. the zero-padded tail chunk."""
    rng = np.random.default_rng(3)
    B, K, H, W, M = 2, 5, 32, 48, 7
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    x = jnp.asarray(det)
    # budget forces KB=2 -> 3 chunks, Kp=6 (one padded plane)
    val, pos = nms_topk_pallas(x, M, 5, _vmem_budget=3 * 32 * 48 * 4 * 2)
    sup = heatmap_nms(x, 5, 2).reshape(B, K, H * W)
    want_v, want_i = lax.top_k(sup, M)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(want_i))


def test_nms_topk_dominant_row_ties():
    """One row holds many equal-valued survivors above everything else:
    every extraction re-selects that row, so tie resolution must come from
    the recorded-position remask (not a plane mutation)."""
    rng = np.random.default_rng(4)
    B, K, H, W, M = 1, 1, 40, 64, 12
    det = (0.1 * rng.standard_normal((B, K, H, W))).astype(np.float32)
    det[0, 0, 17, ::4] = 5.0  # 16 tied peaks in row 17 (NMS keeps ties)
    x = jnp.asarray(det)
    val, pos = nms_topk_pallas(x, M, 5)
    sup = heatmap_nms(x, 5, 2).reshape(B, K, H * W)
    want_v, want_i = lax.top_k(sup, M)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(want_i))


def test_top_k_peaks_batch_matches_vmapped():
    rng = np.random.default_rng(2)
    B, K, H, W, T, M = 2, 4, 40, 56, 2, 8
    det = jnp.asarray(rng.standard_normal((B, K, H, W)), jnp.float32)
    tag = jnp.asarray(rng.standard_normal((B, K, H, W, T)), jnp.float32)

    tag_k, loc_k, val_k = top_k_peaks_batch(det, tag, M, 5)
    want = jax.vmap(lambda d, t: top_k_peaks(d, t, M, 5, 2, method="exact"))(
        det, tag
    )
    np.testing.assert_array_equal(np.asarray(tag_k), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(loc_k), np.asarray(want[1]))
    np.testing.assert_array_equal(np.asarray(val_k), np.asarray(want[2]))

"""Top-k variants: chunked exact correctness, approx sanity, NMS."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from litepose_tpu.ops.nms import chunked_top_k, heatmap_nms, top_k_peaks


@pytest.mark.parametrize("n,k", [(50176, 30), (1000, 30), (300, 30), (100, 7), (512, 30)])
def test_chunked_top_k_matches_exact(n, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, n)).astype(np.float32)
    v_ref, i_ref = lax.top_k(jnp.asarray(x), k)
    v, i = chunked_top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_chunked_top_k_tie_breaking():
    # duplicated values across chunk boundaries must keep first-occurrence order
    x = np.zeros((1, 2048), np.float32)
    x[0, [3, 700, 1500]] = 5.0
    x[0, [100, 1800]] = 7.0
    v, i = chunked_top_k(jnp.asarray(x), 5)
    v_ref, i_ref = lax.top_k(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_approx_topk_catches_strong_peaks():
    # clear separated peaks must all be found by the approx path
    rng = np.random.default_rng(1)
    det = rng.uniform(0, 0.01, (3, 64, 64)).astype(np.float32)
    peaks = [(10, 10), (30, 50), (50, 20)]
    for k in range(3):
        for j, (y, x) in enumerate(peaks):
            det[k, y + k, x] = 1.0 - 0.1 * j
    tag = np.zeros((3, 64, 64, 1), np.float32)
    tag_k, loc_k, val_k = top_k_peaks(jnp.asarray(det), jnp.asarray(tag), 10,
                                      nms_kernel=5, nms_padding=2, method="approx")
    val_k = np.asarray(val_k)
    for k in range(3):
        assert (val_k[k, :3] > 0.5).all()


def test_nms_keeps_only_local_maxima():
    det = np.zeros((1, 16, 16), np.float32)
    det[0, 5, 5] = 1.0
    det[0, 5, 6] = 0.8  # suppressed by the neighbor
    det[0, 12, 12] = 0.6
    out = np.asarray(heatmap_nms(jnp.asarray(det), 5, 2))
    assert out[0, 5, 5] == 1.0
    assert out[0, 5, 6] == 0.0
    assert out[0, 12, 12] == 0.6


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="pallas TPU kernel"
)
def test_pallas_nms_matches_xla_on_tpu():
    from litepose_tpu.ops.pallas_nms import heatmap_nms_pallas

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 14, 224, 224), dtype=np.float32))
    a = np.asarray(heatmap_nms(x, 5, 2))
    b = np.asarray(heatmap_nms_pallas(x, 5))
    np.testing.assert_array_equal(a, b)

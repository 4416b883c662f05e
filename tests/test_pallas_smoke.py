"""Fast per-kernel Pallas smoke parity (runs in the default test selection).

The exhaustive Pallas parity suites (test_pallas_{group,refine,topk}.py) are
marked slow — interpret mode costs minutes on the 1-core CPU host.  This
module keeps one tiny-shape parity case per kernel in the fast path so a
broken kernel import/lowering is caught on every run; full parity (plus the
real-Mosaic drive on TPU) stays in the slow suite and the verify recipe.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from litepose_tpu.ops.group import StaticGroupCfg, match_by_tag, refine
from litepose_tpu.ops.group_ref import GroupParams
from litepose_tpu.ops.nms import heatmap_nms
from litepose_tpu.ops.pallas_group import match_by_tag_batch_pallas
from litepose_tpu.ops.pallas_refine import refine_batch
from litepose_tpu.ops.pallas_topk import nms_topk_pallas


def test_nms_topk_smoke():
    rng = np.random.default_rng(0)
    B, K, H, W, M = 1, 2, 16, 32, 4
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    det[0, 0, 3, 5] = det[0, 0, 9, 20] = 3.0  # a tie
    x = jnp.asarray(det)
    val, pos = nms_topk_pallas(x, M, 5)
    sup = heatmap_nms(x, 5, 2).reshape(B, K, H * W)
    want_v, want_i = lax.top_k(sup, M)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(want_i))


def test_refine_smoke():
    rng = np.random.default_rng(1)
    B, P, K, H, W, T = 1, 3, 3, 16, 16, 1
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    tag = (rng.standard_normal((B, K, H, W, T)) * 2).astype(np.float32)
    people = np.zeros((B, P, K, 3 + T), np.float32)
    people[0, 0, 0] = [4, 5, 0.9, 0.1]
    people[0, 0, 2] = [10, 3, 0.7, 0.2]
    want = jax.vmap(refine)(jnp.asarray(people), jnp.asarray(det), jnp.asarray(tag))
    got = refine_batch(jnp.asarray(people), jnp.asarray(det), jnp.asarray(tag))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_group_smoke():
    rng = np.random.default_rng(2)
    B, K, M, T = 2, 3, 8, 1
    p = GroupParams(num_joints=K, detection_threshold=0.2, tag_threshold=1.0,
                    nms_kernel=5, nms_padding=2, max_num_people=M)
    cfg = StaticGroupCfg.from_params(p, assignment="greedy", topk_method="approx")
    tag = rng.normal(0, 2.0, (B, K, M, T)).astype(np.float32)
    val = np.sort(
        rng.uniform(0, 1, (B, K, M)).astype(np.float32), axis=-1
    )[..., ::-1].copy()
    loc = rng.uniform(0, 30, (B, K, M, 2)).astype(np.float32)
    tag, loc, val = jnp.asarray(tag), jnp.asarray(loc), jnp.asarray(val)
    people_x, ncl_x = jax.vmap(lambda t, l, v: match_by_tag(t, l, v, cfg))(tag, loc, val)
    people_p, ncl_p = match_by_tag_batch_pallas(tag, loc, val, cfg)
    np.testing.assert_array_equal(np.asarray(ncl_p), np.asarray(ncl_x))
    np.testing.assert_allclose(np.asarray(people_p), np.asarray(people_x), atol=1e-5)

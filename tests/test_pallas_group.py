"""Parity: Pallas batched grouping kernel vs the XLA scan (greedy mode).

The Pallas kernel (ops/pallas_group.py) must reproduce ops.group.match_by_tag
exactly — same cost construction, argmin tie order, join/spawn bookkeeping —
since it replaces it on the serving path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# interpret-mode Pallas parity is minutes-slow on the 1-core CPU host;
# tests/test_pallas_smoke.py keeps a fast per-kernel subset in the default run
pytestmark = pytest.mark.slow

from litepose_tpu.ops.group import StaticGroupCfg, match_by_tag
from litepose_tpu.ops.group_ref import GroupParams
from litepose_tpu.ops.pallas_group import match_by_tag_batch_pallas


def _cfg(assignment="greedy", **kw):
    p = GroupParams(num_joints=14, detection_threshold=0.2, tag_threshold=1.0,
                    nms_kernel=5, nms_padding=2, **kw)
    return StaticGroupCfg.from_params(p, assignment=assignment, topk_method="approx")


def _random_inputs(rng, B, K=14, M=30, peaks_per_joint=6, spread=2.0, T=1):
    # a few tight tag clusters (people) + noise, scores sorted desc
    n_people = rng.integers(1, 7)
    centers = rng.normal(0, spread, (n_people, T))
    tag = rng.normal(0, 4.0, (B, K, M, T)).astype(np.float32)
    val = rng.uniform(0, 0.15, (B, K, M)).astype(np.float32)  # mostly sub-thr
    for b in range(B):
        for k in range(K):
            npk = rng.integers(0, peaks_per_joint + 1)
            for i in range(npk):
                who = rng.integers(0, n_people)
                tag[b, k, i, :] = centers[who] + rng.normal(0, 0.05, T)
                val[b, k, i] = rng.uniform(0.3, 1.0)
    val = np.sort(val, axis=-1)[..., ::-1].copy()  # topk returns sorted desc
    loc = rng.uniform(0, 100, (B, K, M, 2)).astype(np.float32)
    return jnp.asarray(tag), jnp.asarray(loc), jnp.asarray(val)


@pytest.mark.parametrize(
    "use_val,ignore_much,T",
    [(True, True, 1), (True, False, 1), (False, True, 1), (True, True, 2)],
)
def test_pallas_matches_xla_scan(use_val, ignore_much, T):
    rng = np.random.default_rng(0)
    B = 9
    cfg = _cfg(use_detection_val=use_val, ignore_too_much=ignore_much)
    tag, loc, val = _random_inputs(rng, B, T=T)

    people_p, ncl_p = match_by_tag_batch_pallas(tag, loc, val, cfg)
    people_x, ncl_x = jax.vmap(lambda t, l, v: match_by_tag(t, l, v, cfg))(tag, loc, val)

    np.testing.assert_array_equal(np.asarray(ncl_p), np.asarray(ncl_x))
    np.testing.assert_allclose(np.asarray(people_p), np.asarray(people_x), atol=1e-5)


def test_pallas_empty_and_full():
    cfg = _cfg()
    B, K, M = 3, 14, 30
    # empty: all scores below threshold
    tag = jnp.zeros((B, K, M, 1))
    loc = jnp.zeros((B, K, M, 2))
    val = jnp.zeros((B, K, M))
    people, ncl = match_by_tag_batch_pallas(tag, loc, val, cfg)
    assert int(jnp.sum(ncl)) == 0
    assert float(jnp.abs(people).sum()) == 0.0

    # full: every peak above threshold with wildly distinct tags -> many spawns
    rng = np.random.default_rng(1)
    tag = jnp.asarray(rng.uniform(-50, 50, (B, K, M, 1)).astype(np.float32))
    val = jnp.asarray(np.sort(rng.uniform(0.5, 1.0, (B, K, M)).astype(np.float32), -1)[..., ::-1].copy())
    people_p, ncl_p = match_by_tag_batch_pallas(tag, loc, val, cfg)
    people_x, ncl_x = jax.vmap(lambda t, l, v: match_by_tag(t, l, v, cfg))(tag, loc, val)
    np.testing.assert_array_equal(np.asarray(ncl_p), np.asarray(ncl_x))
    np.testing.assert_allclose(np.asarray(people_p), np.asarray(people_x), atol=1e-5)


@pytest.mark.parametrize("T,use_val", [(1, True), (2, True), (2, False)])
def test_pallas_hungarian_matches_xla_scan(T, use_val):
    """Exact-assignment (JV) mode: must match the XLA hungarian_prefix path
    bit-for-bit, including assignment tie-breaks."""
    rng = np.random.default_rng(7 + T)
    B = 9
    cfg = _cfg(assignment="hungarian", use_detection_val=use_val)
    tag, loc, val = _random_inputs(rng, B, T=T)

    people_p, ncl_p = match_by_tag_batch_pallas(tag, loc, val, cfg)
    people_x, ncl_x = jax.vmap(lambda t, l, v: match_by_tag(t, l, v, cfg))(tag, loc, val)

    np.testing.assert_array_equal(np.asarray(ncl_p), np.asarray(ncl_x))
    np.testing.assert_allclose(np.asarray(people_p), np.asarray(people_x), atol=1e-5)


def test_pallas_hungarian_dense_scene():
    """Many valid peaks + crowded clusters: exercises long augmenting paths
    and PAD-column assignments (more peaks than clusters)."""
    rng = np.random.default_rng(11)
    B, K, M = 5, 14, 30
    cfg = _cfg(assignment="hungarian")
    tag = jnp.asarray(rng.normal(0, 1.0, (B, K, M, 1)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0, 100, (B, K, M, 2)).astype(np.float32))
    val = jnp.asarray(
        np.sort(rng.uniform(0.3, 1.0, (B, K, M)).astype(np.float32), -1)[..., ::-1].copy()
    )
    people_p, ncl_p = match_by_tag_batch_pallas(tag, loc, val, cfg)
    people_x, ncl_x = jax.vmap(lambda t, l, v: match_by_tag(t, l, v, cfg))(tag, loc, val)
    np.testing.assert_array_equal(np.asarray(ncl_p), np.asarray(ncl_x))
    np.testing.assert_allclose(np.asarray(people_p), np.asarray(people_x), atol=1e-5)


def test_pallas_batch_padding():
    # B not a multiple of the 128-lane width
    cfg = _cfg()
    rng = np.random.default_rng(2)
    tag, loc, val = _random_inputs(rng, 2)
    p2, n2 = match_by_tag_batch_pallas(tag, loc, val, cfg)
    # same content at B=2 must equal the first rows of a padded run
    tag5 = jnp.concatenate([tag, tag, tag[:1]], 0)
    loc5 = jnp.concatenate([loc, loc, loc[:1]], 0)
    val5 = jnp.concatenate([val, val, val[:1]], 0)
    p5, n5 = match_by_tag_batch_pallas(tag5, loc5, val5, cfg)
    np.testing.assert_allclose(np.asarray(p5[:2]), np.asarray(p2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n5[:2]), np.asarray(n2))

"""Parity: Pallas single-pass refine vs the vmapped XLA reference refine."""

import numpy as np
import pytest

# interpret-mode Pallas parity is minutes-slow on the 1-core CPU host;
# tests/test_pallas_smoke.py keeps a fast per-kernel subset in the default run
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from litepose_tpu.ops.group import refine
from litepose_tpu.ops.pallas_refine import refine_batch


def _make_case(rng, B, P, K, H, W, T):
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    tag = (rng.standard_normal((B, K, H, W, T)) * 2).astype(np.float32)
    people = np.zeros((B, P, K, 3 + T), np.float32)
    for b in range(B):
        n = rng.integers(0, P + 1)
        for p in range(n):
            joints = rng.random(K) < 0.6
            people[b, p, joints, 0] = rng.integers(0, W, joints.sum())
            people[b, p, joints, 1] = rng.integers(0, H, joints.sum())
            people[b, p, joints, 2] = rng.random(joints.sum()) + 0.1
            people[b, p, joints, 3:] = rng.standard_normal((joints.sum(), T))
    return people, det, tag


@pytest.mark.parametrize("T", [1, 2])
def test_refine_batch_matches_reference(T):
    rng = np.random.default_rng(0 if T == 1 else 1)
    B, P, K, H, W = 3, 6, 5, 24, 40
    people, det, tag = _make_case(rng, B, P, K, H, W, T)

    want = jax.vmap(refine)(
        jnp.asarray(people), jnp.asarray(det), jnp.asarray(tag)
    )
    got = refine_batch(
        jnp.asarray(people), jnp.asarray(det), jnp.asarray(tag)
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_refine_batch_empty_people():
    rng = np.random.default_rng(2)
    B, P, K, H, W, T = 2, 4, 3, 16, 16, 1
    det = rng.standard_normal((B, K, H, W)).astype(np.float32)
    tag = rng.standard_normal((B, K, H, W, T)).astype(np.float32)
    people = np.zeros((B, P, K, 3 + T), np.float32)
    got = refine_batch(jnp.asarray(people), jnp.asarray(det), jnp.asarray(tag))
    np.testing.assert_array_equal(np.asarray(got), 0.0)

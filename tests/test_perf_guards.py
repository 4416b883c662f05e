"""Guards for performance-critical graph properties.

The identity-BN artifact (PERF_NOTES.md round-3): with real (non-init)
BN/bias values XLA-TPU fuses depthwise convs into downstream conv operand
fusions and recomputes them per output tile (6.4x per block).  The fix is an
``optimization_barrier`` on each depthwise conv's input at eval
(``layers.conv(..., isolate=True)``).  These tests pin the barrier into the
traced eval graphs so a refactor cannot silently drop it.
"""

import jax
import jax.numpy as jnp
import pytest

from litepose_tpu.arch.zoo import get_arch
from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose


def _jaxpr_has_barrier(fn, *args):
    return "optimization_barrier" in str(jax.make_jaxpr(fn)(*args))


@pytest.fixture(scope="module")
def litepose_xs():
    arch = get_arch("auto-XS")
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    x = jnp.zeros((1, arch.img_size, arch.img_size, 3), jnp.float32)
    return spec, arch, params, state, x


def test_eval_graph_isolates_depthwise(litepose_xs):
    spec, arch, params, state, x = litepose_xs
    assert _jaxpr_has_barrier(
        lambda p, s, x: apply_litepose(p, s, x, spec, arch, train=False)[0],
        params, state, x,
    )


def test_eval_graph_isolates_depthwise_b128_serve_shape(litepose_xs):
    """The barrier must survive at the large-batch serving shape too.

    b128 numbers (round 5, trained ckpt, tools/ab_serving.py): 1173.1 img/s
    with closure weights vs 1234.9 at b64 — b64 is the documented serving
    sweet spot; at b128 XLA's fusion choices with folded real constants are
    worse than at b64 even with the barrier (PERF_NOTES round-3 part 2 #4
    measured the unbarriered pathology at +12% there).  This guard pins the
    barrier into the b128-traced graph so the residual can never silently
    regress to the unbarriered 2.3x class."""
    spec, arch, params, state, _ = litepose_xs
    x = jnp.zeros((128, arch.img_size, arch.img_size, 3), jnp.bfloat16)
    assert _jaxpr_has_barrier(
        lambda p, s, x: apply_litepose(p, s, x, spec, arch, train=False,
                                       out_dtype=jnp.bfloat16)[0],
        params, state, x,
    )


def test_train_graph_has_no_barrier(litepose_xs):
    """Training keeps the unmodified graph (isolate=not train)."""
    spec, arch, params, state, x = litepose_xs
    assert not _jaxpr_has_barrier(
        lambda p, s, x: apply_litepose(p, s, x, spec, arch, train=True)[0],
        params, state, x,
    )


def test_barrier_is_semantic_noop(litepose_xs):
    """Eval forward with and without isolation is bit-identical."""
    import litepose_tpu.models.layers as L

    spec, arch, params, state, x = litepose_xs
    outs_a, _ = apply_litepose(params, state, x, spec, arch, train=False)

    orig = L.conv

    def conv_no_iso(p, x, stride=1, groups=1, policy=L.DEFAULT_POLICY,
                    padding=None, isolate=False):
        return orig(p, x, stride=stride, groups=groups, policy=policy,
                    padding=padding, isolate=False)

    L.conv = conv_no_iso
    try:
        outs_b, _ = apply_litepose(params, state, x, spec, arch, train=False)
    finally:
        L.conv = orig
    for a, b in zip(outs_a, outs_b):
        assert jnp.array_equal(a, b)

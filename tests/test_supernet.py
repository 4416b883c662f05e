"""Supernet tests: mask/slice equivalence, subnet extraction, reorganize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from litepose_tpu.arch.manager import ArchManager
from litepose_tpu.models.layers import Policy
from litepose_tpu.models.litepose import ModelSpec, apply_litepose
from litepose_tpu.models.super_litepose import (
    SuperDims,
    apply_super_litepose,
    arch_to_mask_desc,
    extract_subnet,
    init_super_litepose,
    reorganize_weights,
)

EXACT = Policy.exact()


def _setup(img=64):
    manager = ArchManager(seed=0)
    dims = SuperDims.from_manager(manager)
    spec = ModelSpec(num_joints=14)
    params, state = init_super_litepose(jax.random.PRNGKey(0), spec, dims)
    # randomize BN stats so eval normalization is exercised
    def jitter(tree, key=[0]):
        def f(x):
            key[0] += 1
            rng = np.random.default_rng(key[0])
            return jnp.asarray(x) + rng.uniform(0.05, 0.2, np.shape(x)).astype(np.float32)
        return jax.tree.map(f, tree)
    state = jitter(state)
    x = np.random.default_rng(0).standard_normal((2, img, img, 3)).astype(np.float32)
    return manager, dims, spec, params, state, x


def test_masked_forward_matches_extracted_subnet():
    manager, dims, spec, params, state, x = _setup()
    # mask_desc is traced, so ONE jitted super-forward covers all ratios
    super_fwd = jax.jit(lambda p, s, x, d: apply_super_litepose(
        p, s, x, d, spec, dims, train=False, policy=EXACT))
    for ratio in (0.25, 0.5, 1.0):
        arch = manager.fixed_sample(reso=64, ratio=ratio)
        desc = arch_to_mask_desc(arch, manager)
        outs_m, _ = super_fwd(params, state, x, desc)
        sub_p, sub_s = extract_subnet(params, state, arch, dims, spec)
        outs_s, _ = jax.jit(lambda p, s, x, arch=arch: apply_litepose(
            p, s, x, spec, arch, train=False, policy=EXACT))(sub_p, sub_s, x)
        for a, b in zip(outs_m, outs_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_single_jit_covers_all_widths():
    manager, dims, spec, params, state, x = _setup()

    @jax.jit
    def fwd(p, s, x, desc):
        outs, _ = apply_super_litepose(p, s, x, desc, spec, dims, train=False, policy=EXACT)
        return outs[0]

    a1 = fwd(params, state, x, arch_to_mask_desc(manager.fixed_sample(64, 0.25), manager))
    a2 = fwd(params, state, x, arch_to_mask_desc(manager.fixed_sample(64, 1.0), manager))
    assert a1.shape == a2.shape
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_masked_bn_keeps_inactive_channels_zero_and_stats_frozen():
    manager, dims, spec, params, state, x = _setup()
    arch = manager.fixed_sample(reso=64, ratio=0.25)
    desc = arch_to_mask_desc(arch, manager)
    _, new_state = apply_super_litepose(
        params, state, x, desc, spec, dims, train=True, policy=EXACT
    )
    # stem BN: active = arch.input_channel of dims.input_channel
    n_act = arch.input_channel
    old = np.asarray(state["first"]["bn2"]["mean"])
    new = np.asarray(new_state["first"]["bn2"]["mean"])
    assert not np.allclose(old[:n_act], new[:n_act])  # active stats updated
    np.testing.assert_array_equal(old[n_act:], new[n_act:])  # inactive frozen


def test_reorganize_preserves_full_width_function():
    manager, dims, spec, params, state, x = _setup()
    arch = manager.fixed_sample(reso=64, ratio=1.0)
    desc = arch_to_mask_desc(arch, manager)
    outs_before, _ = apply_super_litepose(params, state, x, desc, spec, dims, policy=EXACT)
    params2, state2 = reorganize_weights(params, state)
    outs_after, _ = apply_super_litepose(params2, state2, x, desc, spec, dims, policy=EXACT)
    for a, b in zip(outs_before, outs_after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_kernel_elasticity_transform():
    manager, dims, spec, params, state, x = _setup()
    arch5 = manager.fixed_sample(reso=64, ratio=0.5)
    # build an arch with kernel-5 blocks
    import dataclasses

    from litepose_tpu.arch.schema import StageConfig

    stages = tuple(
        StageConfig(s.num_blocks, s.stride, s.channel,
                    tuple((6, 5) for _ in range(s.num_blocks)))
        for s in arch5.backbone_setting
    )
    arch5 = dataclasses.replace(arch5, backbone_setting=stages)
    desc = arch_to_mask_desc(arch5, manager)
    kernels = [[5] * n for n in dims.stage_blocks]
    outs, _ = apply_super_litepose(
        params, state, x, desc, spec, dims, kernels=kernels, policy=EXACT
    )
    assert outs[0].shape[-1] == 28
    # extraction applies the same learned transform
    sub_p, sub_s = extract_subnet(params, state, arch5, dims, spec)
    outs_s, _ = apply_litepose(sub_p, sub_s, x, spec, arch5, policy=EXACT)
    for a, b in zip(outs, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


@pytest.mark.slow  # ~60s full-step compile; covered by the driver/slow suite
def test_supernet_registry_and_train_step():
    from litepose_tpu.config import default_config
    from litepose_tpu.core.losses import LossConfig
    from litepose_tpu.models import get_model
    from litepose_tpu.train import optim
    from litepose_tpu.train.checkpoint import init_train_state
    from litepose_tpu.train.trainer import StepFns

    cfg = default_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = 14
    cfg.LOSS.NUM_STAGES = 2
    cfg.LOSS.WITH_HEATMAPS_LOSS = (True, True)
    cfg.LOSS.HEATMAPS_LOSS_FACTOR = (1.0, 1.0)
    cfg.LOSS.WITH_AE_LOSS = (True, False)
    cfg.LOSS.PUSH_LOSS_FACTOR = (0.001, 0.001)
    cfg.LOSS.PULL_LOSS_FACTOR = (0.001, 0.001)

    manager = ArchManager(seed=0)
    init_fn, apply_fn = get_model("pose_supermobilenet", cfg, None)
    params, state = init_fn(jax.random.PRNGKey(0))
    tx = optim.make_optimizer("adam", optim.multistep_lr(1e-3, [10], 0.1, 10))

    def train_apply(p, s, x, desc):
        return apply_fn(p, s, x, arch=desc, train=True)

    img = 64
    sfns = StepFns(train_apply, LossConfig(num_joints=14), tx,
                   base_input_size=img, base_output_sizes=[16, 32])
    ts = init_train_state(params, state, tx.init(params))
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 255, (2, img, img, 3)).astype(np.uint8),
        "heatmaps": [rng.random((2, 14, 16, 16), np.float32),
                     rng.random((2, 14, 32, 32), np.float32)],
        "masks": [np.ones((2, 16, 16), np.float32), np.ones((2, 32, 32), np.float32)],
        "joints": [np.zeros((2, 30, 14, 2), np.int32), np.zeros((2, 30, 14, 2), np.int32)],
    }
    fn = sfns.get(with_extra=True)
    for ratio in (0.5, 1.0):  # same compiled fn, different sampled widths
        desc = arch_to_mask_desc(manager.fixed_sample(img, ratio), manager)
        ts, metrics = fn(ts, batch, desc)
        assert np.isfinite(float(metrics["total"]))
    assert int(ts.step) == 2


def test_inject_subnet_roundtrip():
    """inject_subnet is the exact inverse of extract_subnet: injecting a
    trained subnet into a supernet and extracting the same arch returns the
    subnet bit-for-bit, and other leading slices still extract."""
    from litepose_tpu.models.litepose import init_litepose
    from litepose_tpu.models.super_litepose import inject_subnet

    manager, dims, spec, sp, ss, _ = _setup()
    arch = manager.fixed_sample(reso=64, ratio=0.5)
    # a DIFFERENT seed than the supernet init, so a wrong slice is visible
    p, s = init_litepose(jax.random.PRNGKey(7), spec, arch)

    sp2, ss2 = inject_subnet(sp, ss, p, s, arch, dims, spec)
    p2, s2 = extract_subnet(sp2, ss2, arch, dims, spec)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p, p2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s, s2)

    # the masked supernet forward at the injected arch == the subnet forward
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
    desc = arch_to_mask_desc(arch, manager)
    outs_sup, _ = apply_super_litepose(sp2, ss2, x, desc, spec, dims,
                                       train=False, policy=EXACT)
    outs_sub, _ = apply_litepose(p, s, x, spec, arch, train=False, policy=EXACT)
    for a, b in zip(outs_sup, outs_sub):
        ca = b.shape[-1]
        np.testing.assert_allclose(np.asarray(a)[..., :ca], np.asarray(b),
                                   atol=2e-4, rtol=1e-3)

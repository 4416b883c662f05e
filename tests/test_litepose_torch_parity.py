"""Golden-output parity: our JAX LitePose vs the reference torch model.

The reference model (read-only at /root/reference) is imported and run as an
oracle: random-initialized reference weights are converted with
``litepose_from_torch`` and both models must produce near-identical outputs
at fp32/HIGHEST precision.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.arch.zoo import get_arch
from litepose_tpu.models.layers import Policy
from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
from litepose_tpu.models.torch_convert import litepose_from_torch


def _make_ref_model(arch_dict, num_joints=14):
    """Instantiate the reference pose_mobilenet with a minimal cfg shim."""
    add_reference_to_path()
    import torch  # noqa: F401
    from types import SimpleNamespace

    from lib.models import pose_mobilenet

    extra = SimpleNamespace(NUM_DECONV_LAYERS=3, NUM_DECONV_KERNELS=[4, 4, 4])
    loss = SimpleNamespace(
        WITH_HEATMAPS_LOSS=[True, True], WITH_AE_LOSS=[True, False]
    )
    model_cfg = SimpleNamespace(
        EXTRA=extra, NUM_JOINTS=num_joints, TAG_PER_JOINT=True
    )
    cfg = SimpleNamespace(MODEL=model_cfg, LOSS=loss)
    model = pose_mobilenet.LitePose(cfg, cfg_arch=arch_dict)
    model.eval()
    return model


@pytest.mark.parametrize("arch_name", ["search-XS"])
def test_forward_parity_eval(arch_name):
    import torch

    torch.manual_seed(0)
    arch = get_arch(arch_name).with_img_size(128)
    ref = _make_ref_model(arch.to_dict())
    # randomize BN stats so eval-mode normalization is actually exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    spec = ModelSpec(num_joints=14)
    params, state = litepose_from_torch(ref.state_dict(), spec, arch)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3), dtype=np.float32)

    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_outs = [o.numpy().transpose(0, 2, 3, 1) for o in ref_outs]

    outs, _ = apply_litepose(
        params, state, x, spec, arch, train=False, policy=Policy.exact()
    )
    assert len(outs) == len(ref_outs) == 2
    for ours, theirs in zip(outs, ref_outs):
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_output_shapes_and_channels():
    import jax

    arch = get_arch("search-XS").with_img_size(256)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    x = np.zeros((1, 256, 256, 3), np.float32)
    outs, _ = apply_litepose(params, state, x, spec, arch)
    # stage 0 @ img/4 with heatmaps+tags, stage 1 @ img/2 heatmaps only
    assert outs[0].shape == (1, 64, 64, 28)
    assert outs[1].shape == (1, 128, 128, 14)


def test_train_mode_updates_bn_state():
    import jax
    import jax.numpy as jnp

    arch = get_arch("search-XS").with_img_size(64)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    _, new_state = apply_litepose(params, state, x, spec, arch, train=True)
    before = state["first"]["cbr0"]["bn"]["mean"]
    after = new_state["first"]["cbr0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_to_torch_roundtrip_and_strict_load():
    """litepose_to_torch is the exact inverse of litepose_from_torch: the
    emitted state_dict loads strict=True into the reference model and
    round-trips back to bit-identical pytrees."""
    import jax
    import torch

    from litepose_tpu.models.torch_convert import litepose_to_torch

    arch = get_arch("search-XS").with_img_size(64)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(5), spec, arch)

    sd = litepose_to_torch(params, state, spec, arch)
    ref = _make_ref_model(arch.to_dict())
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )

    p2, s2 = litepose_from_torch(ref.state_dict(), spec, arch)
    for a, b in zip(
        jax.tree_util.tree_leaves((params, state)),
        jax.tree_util.tree_leaves((p2, s2)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

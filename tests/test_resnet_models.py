"""LitePose-ResNet family parity and supernet smoke tests."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import add_reference_to_path

from litepose_tpu.models.layers import Policy
from litepose_tpu.models.litepose import ModelSpec
from litepose_tpu.models.litepose_resnet import (
    apply_litepose_resnet,
    apply_super_litepose_resnet,
    init_litepose_resnet,
    init_super_litepose_resnet,
    resnet_arch_manager,
)
from litepose_tpu.models.super_litepose import arch_to_mask_desc


def test_resnet_forward_matches_reference():
    add_reference_to_path()
    import torch
    from types import SimpleNamespace

    from models import pose_resnet

    extra = SimpleNamespace(NUM_DECONV_LAYERS=3, NUM_DECONV_KERNELS=[3, 3, 3])
    extra_dict = {"NUM_DECONV_FILTERS": [64, 48, 32]}

    class Extra(SimpleNamespace):
        def __getitem__(self, k):
            return extra_dict[k]

    e = Extra(NUM_DECONV_LAYERS=3, NUM_DECONV_KERNELS=[3, 3, 3])
    cfg = SimpleNamespace(
        MODEL=SimpleNamespace(EXTRA=e, NUM_JOINTS=14, TAG_PER_JOINT=True),
        LOSS=SimpleNamespace(WITH_HEATMAPS_LOSS=[True, True], WITH_AE_LOSS=[True, False]),
    )
    torch.manual_seed(0)
    ref = pose_resnet.LitePose(cfg)
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    # convert torch weights into our tree
    sd = {k: v for k, v in ref.state_dict().items()}
    from litepose_tpu.models.torch_convert import _bn, conv_w, _np

    spec = ModelSpec(num_joints=14)
    params, state = init_litepose_resnet(jax.random.PRNGKey(0), spec,
                                         deconv_filters=(64, 48, 32),
                                         deconv_kernels=(3, 3, 3))
    # stem
    for i, cbr in enumerate(("cbr0", "cbr1")):
        params["first"][cbr]["conv"]["w"] = conv_w(sd[f"first.{i}.0.weight"])
        pb, sb = _bn(sd, f"first.{i}.1")
        params["first"][cbr]["bn"] = pb
        state["first"][cbr]["bn"] = sb
    # stages (FusedMBConv: inv.0 conv, inv.1 bn, point_conv.0 conv, point_conv.1 bn)
    for si in range(4):
        for bi in range(len(params["stage"][si])):
            pre = f"stage.{si}.{bi}"
            blk_p = params["stage"][si][bi]
            blk_s = state["stage"][si][bi]
            blk_p["inv"]["conv"]["w"] = conv_w(sd[f"{pre}.inv.0.weight"])
            blk_p["inv"]["bn"], blk_s["inv"]["bn"] = _bn(sd, f"{pre}.inv.1")
            blk_p["point"]["conv"]["w"] = conv_w(sd[f"{pre}.point_conv.0.weight"])
            blk_p["point"]["bn"], blk_s["point"]["bn"] = _bn(sd, f"{pre}.point_conv.1")
    # head (UpConv conv = .conv.weight)
    for i in range(3):
        params["deconv_refined"][i]["conv"]["w"] = conv_w(sd[f"deconv_refined.{i}.conv.weight"])
        params["deconv_raw"][i]["conv"]["w"] = conv_w(sd[f"deconv_raw.{i}.conv.weight"])
        pb, sb = _bn(sd, f"deconv_bnrelu.{i}.0")
        params["deconv_bn"][i] = pb
        state["deconv_bn"][i] = sb
    for i in range(2):
        for name in ("final_refined", "final_raw"):
            params[name][i]["w"] = conv_w(sd[f"{name}.{i}.weight"])
            params[name][i]["b"] = _np(sd[f"{name}.{i}.bias"])

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3), dtype=np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_outs = [o.numpy().transpose(0, 2, 3, 1) for o in ref_outs]
    outs, _ = apply_litepose_resnet(params, state, x, spec,
                                    deconv_kernels=(3, 3, 3), policy=Policy.exact())
    for ours, theirs in zip(outs, ref_outs):
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=1e-3)


def test_super_resnet_single_jit_covers_widths():
    spec = ModelSpec(num_joints=14)
    params, state = init_super_litepose_resnet(jax.random.PRNGKey(0), spec)
    manager = resnet_arch_manager()
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)

    @jax.jit
    def fwd(p, s, x, desc):
        outs, _ = apply_super_litepose_resnet(p, s, x, desc, spec, policy=Policy.exact())
        return outs[0]

    a = fwd(params, state, x, arch_to_mask_desc(manager.fixed_sample(64, 0.5), manager))
    b = fwd(params, state, x, arch_to_mask_desc(manager.fixed_sample(64, 1.0), manager))
    assert a.shape == (1, 16, 16, 28)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_registry_has_all_model_families():
    from litepose_tpu.models import available

    names = available()
    for name in ("pose_mobilenet", "pose_simplenet", "pose_supermobilenet",
                 "pose_resnet", "pose_superresnet",
                 "pose_higher_hrnet", "pose_efficient_hrnet"):
        assert name in names

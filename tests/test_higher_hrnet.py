"""HigherHRNet parity vs the reference torch model."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.models.higher_hrnet import (
    HRNetSpec,
    StageSpec,
    apply_higher_hrnet,
    init_higher_hrnet,
)
from litepose_tpu.models.layers import Policy
from litepose_tpu.models.torch_convert import hrnet_from_torch

# a small w16-style gradual-shrinking spec (0-block branches) to exercise
# every structural path at test-feasible size
SMALL_SPEC = HRNetSpec(
    num_joints=14,
    with_ae_loss=(True, False),
    stem_inplanes=16,
    final_conv_kernel=1,
    stage2=StageSpec(1, 2, "BASIC", (0, 2), (16, 32)),
    stage3=StageSpec(2, 3, "BASIC", (0, 0, 2), (16, 32, 64)),
    stage4=StageSpec(1, 4, "BASIC", (0, 0, 0, 2), (16, 32, 64, 128)),
    num_deconvs=1,
    deconv_channels=(32,),
    deconv_kernels=(4,),
    deconv_num_basic_blocks=1,
    cat_output=(True,),
)


def _ref_cfg(spec: HRNetSpec):
    def stage(s):
        return {
            "NUM_MODULES": s.num_modules,
            "NUM_BRANCHES": s.num_branches,
            "BLOCK": s.block,
            "NUM_BLOCKS": list(s.num_blocks),
            "NUM_CHANNELS": list(s.num_channels),
            "FUSE_METHOD": "SUM",
        }

    return {
        "MODEL": {
            "NUM_JOINTS": spec.num_joints,
            "TAG_PER_JOINT": spec.tag_per_joint,
            "EXTRA": {
                "FINAL_CONV_KERNEL": spec.final_conv_kernel,
                "PRETRAINED_LAYERS": ["*"],
                "STEM_INPLANES": spec.stem_inplanes,
                "STAGE2": stage(spec.stage2),
                "STAGE3": stage(spec.stage3),
                "STAGE4": stage(spec.stage4),
                "DECONV": {
                    "NUM_DECONVS": spec.num_deconvs,
                    "NUM_CHANNELS": list(spec.deconv_channels),
                    "KERNEL_SIZE": list(spec.deconv_kernels),
                    "NUM_BASIC_BLOCKS": spec.deconv_num_basic_blocks,
                    "CAT_OUTPUT": list(spec.cat_output),
                },
            },
        },
        "LOSS": {"WITH_AE_LOSS": list(spec.with_ae_loss)},
    }


def test_hrnet_forward_matches_reference():
    add_reference_to_path()
    import torch
    from models.pose_higher_hrnet import PoseHigherResolutionNet

    torch.manual_seed(0)
    ref = PoseHigherResolutionNet(_ref_cfg(SMALL_SPEC))
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    params, state = hrnet_from_torch(ref.state_dict(), SMALL_SPEC)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3), dtype=np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_outs = [o.numpy().transpose(0, 2, 3, 1) for o in ref_outs]

    outs, _ = apply_higher_hrnet(params, state, x, SMALL_SPEC, policy=Policy.exact())
    assert len(outs) == len(ref_outs) == 2
    for ours, theirs in zip(outs, ref_outs):
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4, rtol=1e-3)


def test_hrnet_init_and_shapes():
    import jax

    params, state = init_higher_hrnet(jax.random.PRNGKey(0), SMALL_SPEC)
    x = np.zeros((1, 128, 128, 3), np.float32)
    outs, ns = apply_higher_hrnet(params, state, x, SMALL_SPEC)
    assert outs[0].shape == (1, 32, 32, 28)  # 1/4 res, joints+tags
    assert outs[1].shape == (1, 64, 64, 14)  # 1/2 res, joints only

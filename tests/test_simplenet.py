"""pose_simplenet (no-skip ablation) parity vs the reference."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.arch.zoo import get_arch
from litepose_tpu.models.layers import Policy
from litepose_tpu.models.litepose import ModelSpec, apply_litepose
from litepose_tpu.models.torch_convert import litepose_from_torch


def test_simplenet_forward_matches_reference():
    add_reference_to_path()
    import torch
    from types import SimpleNamespace

    from models import pose_simplenet

    arch = get_arch("search-XS").with_img_size(128)
    extra = SimpleNamespace(NUM_DECONV_LAYERS=3, NUM_DECONV_KERNELS=[4, 4, 4])
    loss = SimpleNamespace(WITH_HEATMAPS_LOSS=[True, True], WITH_AE_LOSS=[True, False])
    cfg = SimpleNamespace(
        MODEL=SimpleNamespace(EXTRA=extra, NUM_JOINTS=14, TAG_PER_JOINT=True),
        LOSS=loss,
    )
    torch.manual_seed(0)
    ref = pose_simplenet.LitePose(cfg, cfg_arch=arch.to_dict())
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    spec = ModelSpec(num_joints=14)
    params, state = litepose_from_torch(ref.state_dict(), spec, arch, with_skips=False)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 128, 128, 3), dtype=np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_outs = [o.numpy().transpose(0, 2, 3, 1) for o in ref_outs]
    outs, _ = apply_litepose(params, state, x, spec, arch, with_skips=False,
                             policy=Policy.exact())
    assert len(outs) == len(ref_outs)
    for ours, theirs in zip(outs, ref_outs):
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)

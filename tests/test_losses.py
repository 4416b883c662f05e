"""Loss parity vs the reference torch implementations."""

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.core.losses import LossConfig, ae_loss, heatmap_loss, multi_loss


def _rand_case(rng, B=2, K=14, H=32, W=32, P=30):
    pred = rng.standard_normal((B, H, W, K)).astype(np.float32)
    gt = rng.standard_normal((B, K, H, W)).astype(np.float32)
    mask = (rng.random((B, H, W)) > 0.3).astype(np.float32)
    joints = np.zeros((B, P, K, 2), np.int64)
    for b in range(B):
        n_people = rng.integers(0, 5)
        for p in range(n_people):
            n_vis = rng.integers(0, K + 1)
            for t in range(n_vis):
                x = rng.integers(0, W)
                y = rng.integers(0, H)
                joints[b, p, t] = (t * H * W + y * W + x, 1)
    return pred, gt, mask, joints


def test_heatmap_loss_matches_reference():
    add_reference_to_path()
    import torch
    from core.loss import HeatmapLoss

    rng = np.random.default_rng(0)
    pred, gt, mask, _ = _rand_case(rng)
    ref = HeatmapLoss()(
        torch.from_numpy(pred.transpose(0, 3, 1, 2)),
        torch.from_numpy(gt),
        torch.from_numpy(mask),
    ).numpy()
    ours = np.asarray(heatmap_loss(pred, gt, mask))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("loss_type", ["exp", "max"])
def test_ae_loss_matches_reference(loss_type):
    add_reference_to_path()
    import torch
    from core.loss import AELoss

    rng = np.random.default_rng(1)
    for trial in range(4):
        pred, _, _, joints = _rand_case(rng)
        B, H, W, K = pred.shape
        tags_flat = pred.transpose(0, 3, 1, 2).reshape(B, -1, 1)
        ref_loss = AELoss(loss_type, 30, H)
        push_ref, pull_ref = ref_loss(
            torch.from_numpy(tags_flat), torch.from_numpy(joints)
        )
        push, pull = ae_loss(pred, joints, loss_type)
        np.testing.assert_allclose(float(push), float(push_ref), atol=1e-6)
        np.testing.assert_allclose(float(pull), float(pull_ref), atol=1e-6)


def test_ae_loss_reference_module_case():
    """The reference's own inline test case (loss.py:369-390)."""
    t = (np.arange(0, 32).reshape(1, 2, 4, 4) * 0.1).astype(np.float32)
    joints = np.zeros((1, 2, 2, 2), np.int64)
    joints[0, 0, 0] = (3, 1)
    joints[0, 0, 1] = (10, 1)
    joints[0, 1, 0] = (22, 1)
    joints[0, 1, 1] = (30, 1)
    push, pull = ae_loss(t.transpose(0, 2, 3, 1), joints, "exp")

    add_reference_to_path()
    import torch
    from core.loss import AELoss

    ref = AELoss("exp", 30, 4)
    push_r, pull_r = ref(torch.from_numpy(t.reshape(1, -1, 1)), torch.from_numpy(joints))
    np.testing.assert_allclose(float(push), float(push_r), atol=1e-7)
    np.testing.assert_allclose(float(pull), float(pull_r), atol=1e-7)


def test_multi_loss_combines_stages():
    rng = np.random.default_rng(2)
    cfg = LossConfig(num_joints=14)
    outs = [
        rng.standard_normal((2, 32, 32, 28)).astype(np.float32),
        rng.standard_normal((2, 64, 64, 14)).astype(np.float32),
    ]
    heatmaps = [
        rng.standard_normal((2, 14, 32, 32)).astype(np.float32),
        rng.standard_normal((2, 14, 64, 64)).astype(np.float32),
    ]
    masks = [np.ones((2, 32, 32), np.float32), np.ones((2, 64, 64), np.float32)]
    joints = [np.zeros((2, 30, 14, 2), np.int64), np.zeros((2, 30, 14, 2), np.int64)]
    total, metrics = multi_loss(outs, heatmaps, masks, joints, cfg)
    assert float(total) > 0
    assert "stage0_heatmap" in metrics and "stage0_push" in metrics
    assert "stage1_heatmap" in metrics and "stage1_push" not in metrics


def test_ae_loss_gradient_flows():
    import jax

    rng = np.random.default_rng(3)
    pred, _, _, joints = _rand_case(rng, B=1)

    def f(x):
        push, pull = ae_loss(x, joints, "exp")
        return push + pull

    g = jax.grad(f)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

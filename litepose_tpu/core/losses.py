"""Training losses: masked heatmap MSE + associative-embedding push/pull.

Numerics match the reference exactly (verified against it in
tests/test_losses.py):
  * ``heatmap_loss``: masked squared error, mean over W, H, joints
    (``/root/reference/lib/core/loss.py:30-39``);
  * ``ae_loss``: the vectorized batch formulation — gather tag values at
    flattened GT joint indices, pull = per-person tag variance, push =
    pairwise exp(-d^2) (or max-hinge) between person mean tags
    (``/root/reference/lib/core/loss.py:95-149``);
  * ``MultiLoss``: per-stage combination with factor weighting
    (``/root/reference/lib/core/loss.py:248-315``).

All functions take NHWC model outputs and the dataset's (B,P,K,2) flat
joint-index arrays (idx = joint*res^2 + y*res + x) unchanged.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def heatmap_loss(pred_nhwc: jnp.ndarray, gt_bkhw: jnp.ndarray, mask_bhw: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE per image. pred: (B,H,W,K); gt: (B,K,H,W); mask: (B,H,W).
    Returns (B,)."""
    gt = jnp.transpose(gt_bkhw, (0, 2, 3, 1))
    err = (pred_nhwc - gt) ** 2 * mask_bhw[..., None]
    return jnp.mean(err, axis=(1, 2, 3))


def ae_loss(
    tags_nhwc: jnp.ndarray,
    joints: jnp.ndarray,
    loss_type: str = "exp",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Associative-embedding (push, pull) scalars.

    tags_nhwc: (B, H, W, K) predicted tag maps (one channel per joint).
    joints: (B, P, K, 2) int — (flat index in joint-major K*H*W layout, vis).
    """
    B, H, W, K = tags_nhwc.shape
    P = joints.shape[1]
    # flatten in the reference's NCHW joint-major order: k*H*W + y*W + x
    flat = jnp.transpose(tags_nhwc, (0, 3, 1, 2)).reshape(B, K * H * W)

    vis = joints[..., 1].astype(jnp.float32)  # (B, P, K)
    loc = joints[..., 0].astype(jnp.int32).reshape(B, P * K)
    tags = jnp.take_along_axis(flat, loc, axis=1).reshape(B, P, K) * vis

    joints_cnt = vis.sum(axis=2, keepdims=True)  # (B, P, 1)
    person_exists = (joints_cnt > 0).astype(jnp.float32)  # (B, P, 1)
    person_cnt = jnp.maximum(person_exists.squeeze(2).sum(axis=1, keepdims=True), 1.0)  # (B,1)
    safe_cnt = jnp.maximum(joints_cnt, 1.0)

    # PULL: per-person tag variance around the person mean
    mean = tags.sum(axis=2, keepdims=True) / safe_cnt  # (B, P, 1)
    pull = jnp.sum(vis * (tags - mean) ** 2, axis=2, keepdims=True) / safe_cnt
    pull = jnp.where(joints_cnt > 0, pull, 0.0)
    pull = pull.squeeze(2).sum(axis=1, keepdims=True) / person_cnt
    pull = jnp.mean(pull)

    # PUSH: pairwise interaction between person mean tags
    pvis = person_exists.squeeze(2)  # (B, P)
    pair_vis = pvis[:, :, None] * pvis[:, None, :]  # (B, P, P)
    mean_mat = jnp.broadcast_to(mean, (B, P, P))
    diff = (mean_mat - jnp.transpose(mean_mat, (0, 2, 1))) * pair_vis
    n = person_cnt.squeeze(1)  # (B,)
    if loss_type == "exp":
        d = jnp.exp(-(diff**2)) * pair_vis
    elif loss_type == "max":
        d = jnp.clip(1.0 - jnp.abs(diff), 0.0) * pair_vis
    else:
        raise ValueError(f"unknown AE loss type {loss_type!r}")
    denom = jnp.maximum((n - 1.0) * n, 1.0)
    per_img = 0.5 * (jnp.sum(d, axis=(1, 2)) - n) / denom
    per_img = jnp.where(n < 2, 0.0, per_img)
    push = jnp.mean(per_img)
    return push, pull


class LossConfig(NamedTuple):
    num_joints: int
    num_stages: int = 2
    with_heatmaps: Tuple[bool, ...] = (True, True)
    heatmaps_factor: Tuple[float, ...] = (1.0, 1.0)
    with_ae: Tuple[bool, ...] = (True, False)
    ae_type: str = "exp"
    push_factor: Tuple[float, ...] = (0.001, 0.001)
    pull_factor: Tuple[float, ...] = (0.001, 0.001)

    @staticmethod
    def from_config(cfg) -> "LossConfig":
        return LossConfig(
            num_joints=cfg.MODEL.NUM_JOINTS,
            num_stages=cfg.LOSS.NUM_STAGES,
            with_heatmaps=tuple(cfg.LOSS.WITH_HEATMAPS_LOSS),
            heatmaps_factor=tuple(cfg.LOSS.HEATMAPS_LOSS_FACTOR),
            with_ae=tuple(cfg.LOSS.WITH_AE_LOSS),
            ae_type=cfg.LOSS.AE_LOSS_TYPE,
            push_factor=tuple(cfg.LOSS.PUSH_LOSS_FACTOR),
            pull_factor=tuple(cfg.LOSS.PULL_LOSS_FACTOR),
        )


def multi_loss(
    outputs: Sequence[jnp.ndarray],  # per stage NHWC
    heatmaps: Sequence[jnp.ndarray],  # per stage (B,K,R,R)
    masks: Sequence[jnp.ndarray],  # per stage (B,R,R)
    joints: Sequence[jnp.ndarray],  # per stage (B,P,K,2)
    cfg: LossConfig,
):
    """Combined scalar loss + per-stage metric dict."""
    assert len(outputs) == cfg.num_stages
    total = 0.0
    metrics = {}
    for i, out in enumerate(outputs):
        offset = 0
        if cfg.with_heatmaps[i]:
            hm = heatmap_loss(out[..., : cfg.num_joints], heatmaps[i], masks[i])
            hm = jnp.mean(hm) * cfg.heatmaps_factor[i]
            total = total + hm
            metrics[f"stage{i}_heatmap"] = hm
            offset = cfg.num_joints
        if cfg.with_ae[i]:
            push, pull = ae_loss(out[..., offset:], joints[i], cfg.ae_type)
            push = push * cfg.push_factor[i]
            pull = pull * cfg.pull_factor[i]
            total = total + push + pull
            metrics[f"stage{i}_push"] = push
            metrics[f"stage{i}_pull"] = pull
    metrics["total"] = total
    return total, metrics


def distill_loss(
    outputs: Sequence[jnp.ndarray],
    teacher_heatmaps: Sequence[jnp.ndarray],  # per stage (B,K,R,R), detached
    masks: Sequence[jnp.ndarray],
    cfg: LossConfig,
):
    """Teacher-heatmap MSE added during distillation (reference
    ``/root/reference/lib/core/trainer.py:61-92``)."""
    total = 0.0
    for i, out in enumerate(outputs):
        if cfg.with_heatmaps[i]:
            hm = heatmap_loss(
                out[..., : cfg.num_joints],
                jax.lax.stop_gradient(teacher_heatmaps[i]),
                masks[i],
            )
            total = total + jnp.mean(hm) * cfg.heatmaps_factor[i]
    return total

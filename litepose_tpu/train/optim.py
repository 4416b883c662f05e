"""Optimizers and LR schedules (optax).

Replaces the reference's torch optimizer factory + MultiStepLR
(``/root/reference/lib/utils/utils.py:77-93``,
``/root/reference/dist_train.py:328-337``) and ships the LR schedule the
reference forgot to include (its ``from scheduler import WarmupMultiStepLR``
crashes at import — ``/root/reference/dist_train.py:46``; what it actually
uses is MultiStepLR).  The whole fp16 loss-scaling layer
(``/root/reference/lib/fp16_utils/``) is obsolete on TPU: params and adam
moments stay fp32, conv/matmul compute is bf16 via the model Policy.
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def multistep_lr(
    base_lr: float,
    milestones_epochs: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
    warmup_steps: int = 0,
) -> optax.Schedule:
    """MultiStepLR (gamma decay at epoch milestones), with optional linear
    warmup (the missing WarmupMultiStepLR, shipped properly)."""
    boundaries = {int(e) * steps_per_epoch: gamma for e in milestones_epochs}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def make_optimizer(
    optimizer: str,
    schedule: optax.Schedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """'adam' (no weight decay — matches the reference factory) or 'sgd'
    (momentum + wd + nesterov)."""
    if optimizer == "adam":
        return optax.adam(schedule)
    if optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=momentum, nesterov=nesterov),
        )
    raise ValueError(f"unknown optimizer {optimizer!r}")


def from_config(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = multistep_lr(
        cfg.TRAIN.LR, cfg.TRAIN.LR_STEP, cfg.TRAIN.LR_FACTOR, steps_per_epoch
    )
    return make_optimizer(
        cfg.TRAIN.OPTIMIZER, sched,
        momentum=cfg.TRAIN.MOMENTUM, weight_decay=cfg.TRAIN.WD,
        nesterov=cfg.TRAIN.NESTEROV,
    )

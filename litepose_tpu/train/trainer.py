"""SPMD training step + epoch loop.

TPU redesign of the reference trainer (``/root/reference/lib/core/trainer.py``
+ ``/root/reference/dist_train.py``): one jitted, donated train step per
(input-resolution) bucket over a ``Mesh('data')``; the batch arrives uint8
NHWC and is normalized on device; gradient all-reduce and SyncBN are
implicit under SPMD jit.  The supernet's elastic-resolution trick (random
input size per step, ``trainer.py:49-59``) becomes a per-bucket compiled
step with nearest-neighbor resizes and a *correct* joint-index remap (the
reference remaps with a hardcoded ``% 512`` that scrambles sub-pixel
positions for non-512 encodings; we rescale (x, y) within the true source
resolution).

Distillation (``trainer.py:61-92``): a frozen teacher forward runs inside
the same jitted step; its heatmaps (resized to the student's output sizes)
add an extra masked-MSE term.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.inference import normalize_images
from ..core.losses import LossConfig, distill_loss, multi_loss
from .checkpoint import TrainState


def _nearest_resize(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate default (nearest) semantics on NHWC/NCHW-agnostic
    spatial dims given as the middle axes of a 4D array (B, H, W, C) or a
    3D (B, H, W)."""
    if x.ndim == 3:
        return jax.image.resize(x, (x.shape[0],) + hw, method="nearest")
    return jax.image.resize(x, (x.shape[0],) + hw + (x.shape[-1],), method="nearest")


def remap_joint_indices(joints: jnp.ndarray, src_res: int, dst_res: int) -> jnp.ndarray:
    """Rescale flat joint indices (j*r^2 + y*r + x) from src_res to dst_res."""
    flat = joints[..., 0].astype(jnp.int32)
    vis = joints[..., 1]
    j = flat // (src_res * src_res)
    rem = flat % (src_res * src_res)
    y = rem // src_res
    x = rem % src_res
    x2 = (x * dst_res) // src_res
    y2 = (y * dst_res) // src_res
    new_flat = j * dst_res * dst_res + y2 * dst_res + x2
    return jnp.stack([new_flat.astype(joints.dtype), vis], axis=-1)


class StepFns:
    """Per-resolution-bucket compiled train steps with a shared signature."""

    def __init__(
        self,
        apply_fn: Callable,  # (params, mstate, x, train=True[, arch_desc]) -> (outs, new_state)
        loss_cfg: LossConfig,
        tx: optax.GradientTransformation,
        base_input_size: int,
        base_output_sizes: Sequence[int],
        teacher_fn: Optional[Callable] = None,  # (x448) -> [teacher outs]
        teacher_size: int = 448,
        remat: bool = False,
    ):
        if remat:
            # rematerialize activations in the backward pass — trades FLOPs
            # for HBM (useful at 512^2 inputs / large per-chip batches)
            apply_fn = jax.checkpoint(apply_fn)
        self.apply_fn = apply_fn
        self.loss_cfg = loss_cfg
        self.tx = tx
        self.base_input_size = base_input_size
        self.base_output_sizes = list(base_output_sizes)
        self.teacher_fn = teacher_fn
        self.teacher_size = teacher_size
        self._cache: Dict[Any, Callable] = {}

    def get(self, img_size: Optional[int] = None, with_extra: bool = False) -> Callable:
        """Compiled step for a given elastic input size (None = native).

        with_extra: the step takes a third traced argument (e.g. the
        supernet's sampled-arch mask vector) — ONE compiled graph covers all
        values."""
        key = (img_size, with_extra)
        if key not in self._cache:
            self._cache[key] = self._build(img_size, with_extra)
        return self._cache[key]

    def _build(self, img_size: Optional[int], with_extra: bool):
        loss_cfg = self.loss_cfg
        apply_fn = self.apply_fn
        tx = self.tx
        teacher_fn = self.teacher_fn

        def step(ts: TrainState, batch, extra=None):
            images = normalize_images(batch["images"])
            heatmaps = list(batch["heatmaps"])
            masks = list(batch["masks"])
            joints = list(batch["joints"])

            if img_size is not None and img_size != self.base_input_size:
                images = _nearest_resize(images, (img_size, img_size))
                out_size = img_size // 4
                for i in range(len(heatmaps)):
                    src = self.base_output_sizes[i]
                    heatmaps[i] = jax.image.resize(
                        heatmaps[i],
                        (heatmaps[i].shape[0], heatmaps[i].shape[1], out_size, out_size),
                        method="nearest",
                    )
                    masks[i] = _nearest_resize(masks[i], (out_size, out_size))
                    joints[i] = remap_joint_indices(joints[i], src, out_size)
                    out_size *= 2

            t_heatmaps = None
            if teacher_fn is not None:
                t_in = _nearest_resize(images, (self.teacher_size, self.teacher_size))
                t_outs = teacher_fn(t_in)
                t_heatmaps = []
                for i, h in enumerate(heatmaps):
                    hw = h.shape[2:4]
                    t_hm = t_outs[i][..., : loss_cfg.num_joints]
                    t_hm = jnp.transpose(t_hm, (0, 3, 1, 2))
                    t_hm = jax.image.resize(
                        t_hm, t_hm.shape[:2] + hw, method="nearest"
                    )
                    t_heatmaps.append(jax.lax.stop_gradient(t_hm))

            def loss_fn(params):
                if with_extra:
                    outs, new_mstate = apply_fn(
                        params, ts.model_state, images, extra
                    )
                else:
                    outs, new_mstate = apply_fn(params, ts.model_state, images)
                loss, metrics = multi_loss(outs, heatmaps, masks, joints, loss_cfg)
                if t_heatmaps is not None:
                    t_loss = distill_loss(outs, t_heatmaps, masks, loss_cfg)
                    loss = loss + t_loss
                    metrics["distill"] = t_loss
                    metrics["total"] = loss
                return loss, (new_mstate, metrics)

            (loss, (new_mstate, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(ts.params)
            updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
            new_params = optax.apply_updates(ts.params, updates)
            new_ts = TrainState(
                params=new_params,
                model_state=new_mstate,
                opt_state=new_opt,
                step=ts.step + 1,
                epoch=ts.epoch,
                best_perf=ts.best_perf,
            )
            return new_ts, metrics

        return jax.jit(step, donate_argnums=(0,))


class AverageMeter:
    """Running average (reference ``lib/utils/utils.py:169-184``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0


def train_epoch(
    step_fns: StepFns,
    ts: TrainState,
    batches,
    epoch: int,
    logger=None,
    print_freq: int = 20,
    elastic_sizes: Optional[Sequence[int]] = None,
    arch_sampler: Optional[Callable[[np.random.Generator], Any]] = None,
    seed: int = 0,
    writer=None,
):
    """One epoch over an iterator of host batches.

    elastic_sizes: when set (supernet training), a random input size is
    drawn per step; arch_sampler: when set, a random sub-arch descriptor is
    drawn per step and passed as the step's static argument.
    """
    meters: Dict[str, AverageMeter] = {}
    rng = np.random.default_rng((seed, epoch))
    t0 = time.time()
    data_meter, batch_meter = AverageMeter(), AverageMeter()
    for i, batch in enumerate(batches):
        data_meter.update(time.time() - t0)
        img_size = None
        if elastic_sizes is not None:
            img_size = int(rng.choice(np.asarray(elastic_sizes)))
        extra = arch_sampler(rng) if arch_sampler is not None else None
        fn = step_fns.get(img_size, extra is not None)
        if extra is not None:
            ts, metrics = fn(ts, batch, extra)
        else:
            ts, metrics = fn(ts, batch)
        if i % print_freq == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(v, len(batch["images"]))
            batch_meter.update(time.time() - t0)
            if logger:
                msg = " ".join(f"{k}: {m.val:.3e} ({m.avg:.3e})" for k, m in meters.items())
                speed = len(batch["images"]) / max(batch_meter.val, 1e-9)
                logger.info(
                    f"Epoch [{epoch}][{i}] time {batch_meter.val:.3f}s "
                    f"speed {speed:.1f} img/s data {data_meter.val:.3f}s {msg}"
                )
            if writer is not None:
                for k, v in metrics.items():
                    writer.add_scalar(f"train_{k}", v, int(ts.step))
        t0 = time.time()
    return ts, {k: m.avg for k, m in meters.items()}

"""Checkpoint save/restore + PyTorch pretrain import.

Replaces the reference's torch.save/torch.load checkpointing
(``/root/reference/lib/utils/utils.py:96-104``, auto-resume at
``/root/reference/dist_train.py:317-326``).  Serialization is msgpack via
flax.serialization (framework-neutral, no pickle of code objects).

Also provides the pretrain path: load a reference ``.pth[.tar]`` LitePose
checkpoint, skipping head keys exactly like the reference does when
initializing from a backbone pretrain
(``/root/reference/lib/models/pose_mobilenet.py:158-176`` filters 'deconv'
and 'final' keys).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, NamedTuple, Optional

import jax
import numpy as np
from flax import serialization


class TrainState(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    step: Any
    epoch: Any
    best_perf: Any


def init_train_state(params, model_state, opt_state,
                     step: int = 0, epoch: int = 0, best_perf: float = -1.0) -> TrainState:
    """Build a TrainState with array-typed scalars so jitted train steps see
    stable avals across calls (python-int leaves change weak/strong typing
    after the first step and force a recompile)."""
    import jax.numpy as jnp

    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=opt_state,
        step=jnp.asarray(step, jnp.int32),
        epoch=jnp.asarray(epoch, jnp.int32),
        best_perf=jnp.asarray(best_perf, jnp.float32),
    )


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, ts: TrainState, is_best: bool = False,
                    filename: str = "checkpoint.msgpack") -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, filename)
    payload = {
        "params": serialization.to_state_dict(_to_numpy(ts.params)),
        "model_state": serialization.to_state_dict(_to_numpy(ts.model_state)),
        "opt_state": serialization.to_state_dict(_to_numpy(ts.opt_state)),
        "step": int(ts.step),
        "epoch": int(ts.epoch),
        "best_perf": float(ts.best_perf),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    if is_best:
        shutil.copyfile(path, os.path.join(directory, "model_best.msgpack"))
    return path


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the shape of ``template`` (a freshly-initialized state)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(template.params, payload["params"])
    model_state = serialization.from_state_dict(template.model_state, payload["model_state"])
    opt_state = serialization.from_state_dict(template.opt_state, payload["opt_state"])
    return init_train_state(
        params, model_state, opt_state,
        step=int(payload["step"]), epoch=int(payload["epoch"]),
        best_perf=float(payload["best_perf"]),
    )


def auto_resume(directory: str, template: TrainState) -> TrainState:
    """Resume from ``directory/checkpoint.msgpack`` if present (the
    reference AUTO_RESUME behavior)."""
    path = os.path.join(directory, "checkpoint.msgpack")
    if os.path.isfile(path):
        return load_checkpoint(path, template)
    return template


def save_params(path: str, params, model_state) -> None:
    """Weights-only export (analog of final_state.pth.tar)."""
    payload = {
        "params": serialization.to_state_dict(_to_numpy(params)),
        "model_state": serialization.to_state_dict(_to_numpy(model_state)),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_params(path: str, params_template, state_template):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return (
        serialization.from_state_dict(params_template, payload["params"]),
        serialization.from_state_dict(state_template, payload["model_state"]),
    )


def load_pretrained_backbone(params, state, torch_sd, spec, arch):
    """Initialize backbone weights from a reference torch checkpoint,
    keeping our randomly-initialized head (deconv/final) — the reference
    pretrain-loading rule."""
    from ..models.torch_convert import litepose_from_torch, strip_prefixes

    sd = strip_prefixes(torch_sd)
    has_head = any("deconv" in k or "final" in k for k in sd)
    if not has_head:
        raise ValueError("checkpoint has no head keys; expected a full LitePose state_dict")
    conv_params, conv_state = litepose_from_torch(sd, spec, arch)
    for k in ("first", "stage"):
        params[k] = conv_params[k]
        state[k] = conv_state[k]
    return params, state

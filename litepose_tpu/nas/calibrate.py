"""BatchNorm re-calibration for extracted sub-networks.

A weight-sharing supernet's BN running statistics do not match any single
sub-network; before evaluating a candidate, its BN stats are recomputed by
forwarding calibration batches in train mode (reference
``calibrate_test.py:57-59`` runs the ``calibrate`` split with
``model.train()``).

Two modes:
  * ``momentum`` — exactly the reference behavior (EMA with momentum 0.1);
  * ``average`` (default) — true mean of the batch moments over all
    calibration batches, which is what the EMA is approximating.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp


def _zero_like_bn_state(state):
    """Reset every BN state leaf: mean->0, var->0 (for accumulation)."""
    def f(path_leaf):
        return jnp.zeros_like(path_leaf)

    return jax.tree.map(f, state)


def calibrate_bn(
    apply_train_fn: Callable,  # (params, state, images) -> (outs, new_state)
    params,
    state,
    batches: Iterable,
    mode: str = "average",
):
    """Recompute BN statistics from calibration batches.

    ``batches`` yields image arrays (already normalized or raw — whatever
    ``apply_train_fn`` expects).  Returns the calibrated state pytree.
    """
    if mode == "momentum":
        for images in batches:
            _, state = apply_train_fn(params, state, images)
        return state

    assert mode == "average", mode
    # accumulate batch moments: run with momentum-1-like trick by averaging
    # the per-batch new-state deltas.  batch_norm writes
    # new = 0.9*old + 0.1*batch; recover batch = (new - 0.9*old)/0.1.
    acc = None
    count = 0
    for images in batches:
        _, new_state = apply_train_fn(params, state, images)
        batch_stats = jax.tree.map(
            lambda new, old: (new - 0.9 * old) / 0.1, new_state, state
        )
        acc = batch_stats if acc is None else jax.tree.map(jnp.add, acc, batch_stats)
        count += 1
    if acc is None:
        return state
    return jax.tree.map(lambda x: x / count, acc)

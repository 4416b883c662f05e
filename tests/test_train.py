"""Training step tests: loss decreases, BN state updates, SPMD sharding."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from litepose_tpu.arch.manager import ArchManager
from litepose_tpu.config import default_config
from litepose_tpu.core.losses import LossConfig
from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
from litepose_tpu.parallel import make_mesh, replicate_spec, shard_batch_spec, shard_pytree
from litepose_tpu.train import optim
from litepose_tpu.train.checkpoint import (
    TrainState,
    auto_resume,
    init_train_state,
    load_checkpoint,
    save_checkpoint,
)
from litepose_tpu.train.trainer import StepFns, remap_joint_indices


def _tiny_setup(img=64, batch=8):
    arch = ArchManager().fixed_sample(reso=img, ratio=0.25)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    tx = optim.make_optimizer("adam", optim.multistep_lr(1e-3, [100], 0.1, 10))
    loss_cfg = LossConfig(num_joints=14)

    def apply_fn(p, s, x):
        return apply_litepose(p, s, x, spec, arch, train=True)

    sfns = StepFns(apply_fn, loss_cfg, tx, base_input_size=img,
                   base_output_sizes=[img // 4, img // 2])
    ts = init_train_state(params, state, tx.init(params))
    rng = np.random.default_rng(0)
    batch_data = {
        "images": rng.integers(0, 255, (batch, img, img, 3)).astype(np.uint8),
        "heatmaps": [
            rng.random((batch, 14, img // 4, img // 4)).astype(np.float32) * 0.5,
            rng.random((batch, 14, img // 2, img // 2)).astype(np.float32) * 0.5,
        ],
        "masks": [
            np.ones((batch, img // 4, img // 4), np.float32),
            np.ones((batch, img // 2, img // 2), np.float32),
        ],
        "joints": [
            np.zeros((batch, 30, 14, 2), np.int32),
            np.zeros((batch, 30, 14, 2), np.int32),
        ],
    }
    # a couple of valid joints
    for b in range(batch):
        batch_data["joints"][0][b, 0, 0] = (5 * (img // 4) + 5, 1)
        batch_data["joints"][0][b, 0, 1] = ((img // 4) ** 2 + 3 * (img // 4) + 8, 1)
    return sfns, ts, batch_data


def test_train_step_decreases_loss():
    sfns, ts, batch = _tiny_setup()
    fn = sfns.get()
    losses = []
    for _ in range(4):
        ts, metrics = fn(ts, batch)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0]
    assert int(ts.step) == 4


def test_train_step_sharded_over_mesh():
    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8  # conftest forces 8 CPU devices
    sfns, ts, batch = _tiny_setup(batch=8)
    bspec = shard_batch_spec(mesh)
    rspec = replicate_spec(mesh)
    ts = TrainState(
        shard_pytree(ts.params, rspec),
        shard_pytree(ts.model_state, rspec),
        shard_pytree(ts.opt_state, rspec),
        ts.step, ts.epoch, ts.best_perf,
    )
    batch = jax.tree.map(
        lambda x: jax.device_put(x, bspec) if hasattr(x, "shape") and x.ndim > 0 else x,
        batch,
    )
    fn = sfns.get()
    ts2, metrics = fn(ts, batch)
    assert np.isfinite(float(metrics["total"]))
    # params remain replicated after the step
    leaf = jax.tree.leaves(ts2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_elastic_resolution_step():
    sfns, ts, batch = _tiny_setup(img=64)
    fn = sfns.get(img_size=32)  # downscale bucket
    ts2, metrics = fn(ts, batch)
    assert np.isfinite(float(metrics["total"]))


def test_remap_joint_indices():
    joints = np.zeros((1, 1, 2, 2), np.int32)
    # joint 1 at (y=10, x=6) in res 16
    joints[0, 0, 0] = (1 * 16 * 16 + 10 * 16 + 6, 1)
    out = np.asarray(remap_joint_indices(jnp.asarray(joints), 16, 8))
    flat = out[0, 0, 0, 0]
    assert flat == 1 * 64 + 5 * 8 + 3
    assert out[0, 0, 0, 1] == 1
    assert out[0, 0, 1, 1] == 0


def test_checkpoint_roundtrip(tmp_path):
    sfns, ts, batch = _tiny_setup()
    fn = sfns.get()
    ts, _ = fn(ts, batch)
    import jax.numpy as jnp
    ts = ts._replace(epoch=jnp.asarray(3), best_perf=jnp.asarray(0.5))
    save_checkpoint(str(tmp_path), ts, is_best=True)

    # fresh template, then resume
    sfns2, template, _ = _tiny_setup()
    restored = auto_resume(str(tmp_path), template)
    assert int(restored.epoch) == 3 and float(restored.best_perf) == 0.5
    a = jax.tree.leaves(ts.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer state (adam moments) survives
    ma = jax.tree.leaves(ts.opt_state)[0]
    mb = jax.tree.leaves(restored.opt_state)[0]
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mb))
    # continuing training works
    ts3, metrics = sfns2.get()(restored, _tiny_setup()[2])
    assert np.isfinite(float(metrics["total"]))


def test_distillation_step():
    arch = ArchManager().fixed_sample(reso=64, ratio=0.25)
    spec = ModelSpec(num_joints=14)
    t_params, t_state = init_litepose(jax.random.PRNGKey(1), spec, arch)

    def teacher_fn(x):
        outs, _ = apply_litepose(t_params, t_state, x, spec, arch, train=False)
        return outs

    sfns, ts, batch = _tiny_setup()
    sfns.teacher_fn = teacher_fn
    sfns.teacher_size = 64
    fn = sfns.get()
    ts2, metrics = fn(ts, batch)
    assert "distill" in metrics
    assert np.isfinite(float(metrics["distill"]))


def test_remat_step_matches_plain():
    sfns_a, ts_a, batch = _tiny_setup()
    sfns_b, ts_b, _ = _tiny_setup()
    sfns_b_apply = sfns_b.apply_fn
    from litepose_tpu.train.trainer import StepFns
    from litepose_tpu.train import optim as _optim
    from litepose_tpu.core.losses import LossConfig

    tx = sfns_b.tx
    sfns_r = StepFns(sfns_b_apply, LossConfig(num_joints=14), tx,
                     base_input_size=64, base_output_sizes=[16, 32], remat=True)
    ts_a2, m_a = sfns_a.get()(ts_a, batch)
    ts_r2, m_r = sfns_r.get()(ts_b, batch)
    np.testing.assert_allclose(float(m_a["total"]), float(m_r["total"]), rtol=1e-5)
    a = jax.tree.leaves(ts_a2.params)[0]
    b = jax.tree.leaves(ts_r2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

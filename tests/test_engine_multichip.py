"""Multi-chip data-parallel serving: PoseEngine over an 8-device mesh.

The engine's ``mesh`` mode runs the full fused serve program (normalize ->
forward -> aggregate -> NMS/top-k -> AE grouping) under ``jax.shard_map``
with the batch dim sharded across chips — required because the decode is
Pallas custom calls that XLA's SPMD partitioner cannot split.  Every image's
pipeline is independent, so the sharded run must produce bit-identical
results to the single-device run.

Reference scope note: the reference serves single-device only
(/root/reference/nano_demo/core/__init__.py); multi-chip serving is a
TPU-native capability addition, validated here on the virtual CPU mesh.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # 8-way shard_map compiles are heavy on CPU

import jax

from litepose_tpu.arch.manager import ArchManager
from litepose_tpu.core.engine import EngineConfig, PoseEngine
from litepose_tpu.core.inference import InferenceFlags
from litepose_tpu.data.flip import flip_index_for
from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
from litepose_tpu.ops.group_ref import GroupParams
from litepose_tpu.parallel.mesh import make_mesh


def _engine(mesh=None, assignment="greedy", topk_method="approx", flip=False):
    arch = ArchManager().fixed_sample(reso=128, ratio=0.25)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
        return outs

    flags = InferenceFlags(
        num_joints=14,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=flip, flip_index=tuple(flip_index_for("crowd_pose_kpt")),
    )
    group = GroupParams(num_joints=14, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)
    cfg = EngineConfig(input_size=128, project2image=False,
                       assignment=assignment, topk_method=topk_method)
    return PoseEngine(apply_fn, params, state, flags, group, cfg, mesh=mesh)


def _imgs(bs):
    return np.random.default_rng(3).integers(
        0, 255, (bs, 128, 128, 3)
    ).astype(np.uint8)


needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs >=8 devices (conftest provides 8 virtual CPU devices)",
)


def _chunked_ref(eng, imgs, per_dev):
    """Single-device reference at the SAME per-device batch the sharded run
    uses.  A full-batch single-device run is not comparable bit-for-bit:
    XLA's conv/gemm blocking reassociates fp sums per batch shape, so the
    sharding contract is program-shape-for-program-shape identity."""
    outs = [eng.process_batch_square(imgs[i:i + per_dev])
            for i in range(0, len(imgs), per_dev)]
    return tuple(np.concatenate([o[j] for o in outs]) for j in range(3))


@needs_8_devices
def test_sharded_serving_matches_single_device():
    imgs = _imgs(8)
    ref_people, ref_scores, ref_n = _chunked_ref(_engine(mesh=None), imgs, 1)
    eng = _engine(mesh=make_mesh(8))
    people, scores, n = eng.process_batch_square(imgs)
    np.testing.assert_array_equal(n, ref_n)
    np.testing.assert_array_equal(people, ref_people)
    np.testing.assert_array_equal(scores, ref_scores)


@needs_8_devices
def test_sharded_serving_exact_decode_and_flip():
    # eval-grade decode (exact top-k + Hungarian) + flip test also shards
    imgs = _imgs(8)
    ref = _chunked_ref(
        _engine(assignment="hungarian", topk_method="exact", flip=True),
        imgs, 1)
    got = _engine(mesh=make_mesh(8), assignment="hungarian",
                  topk_method="exact", flip=True).process_batch_square(imgs)
    np.testing.assert_array_equal(got[2], ref[2])
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])


@needs_8_devices
def test_sharded_serving_rejects_indivisible_batch():
    eng = _engine(mesh=make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        eng.process_batch_square(_imgs(6))

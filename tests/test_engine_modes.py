"""Engine mode coverage: multi-scale, WITH_CENTER, serving fast path."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import numpy as np
import pytest

import jax

from litepose_tpu.arch.manager import ArchManager
from litepose_tpu.core.engine import EngineConfig, PoseEngine
from litepose_tpu.core.inference import InferenceFlags
from litepose_tpu.data.flip import flip_index_for
from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
from litepose_tpu.ops.group_ref import GroupParams


def _engine(num_joints=14, with_center=False, scale_factors=(1.0,),
            flip=False, assignment="hungarian", project2image=True, img=128):
    arch = ArchManager().fixed_sample(reso=img, ratio=0.25)
    spec = ModelSpec(num_joints=num_joints)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
        return outs

    ds = "crowd_pose_kpt"
    flags = InferenceFlags(
        num_joints=num_joints,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=flip, flip_index=tuple(flip_index_for(ds, with_center)),
        ignore_center=with_center,
    )
    group = GroupParams(
        num_joints=num_joints - 1 if with_center else num_joints,
        detection_threshold=0.1, nms_kernel=5, nms_padding=2,
    )
    return PoseEngine(
        apply_fn, params, state, flags, group,
        EngineConfig(input_size=img, scale_factors=scale_factors,
                     project2image=project2image),
    )


def test_multi_scale_eval_runs():
    eng = _engine(scale_factors=(0.5, 1.0, 2.0))
    img = np.random.default_rng(0).integers(0, 255, (100, 140, 3)).astype(np.uint8)
    people, scores = eng.process(img)
    assert isinstance(people, list) and len(scores) == len(people)


def test_with_center_engine():
    # 15-joint model (14 + center), center channel dropped at decode
    eng = _engine(num_joints=15, with_center=True)
    img = np.random.default_rng(1).integers(0, 255, (100, 120, 3)).astype(np.uint8)
    people, scores = eng.process(img)
    for person in people:
        assert person.shape[0] == 14  # center removed


def test_process_many_matches_per_image():
    # batched bucketed eval must be result-identical to the per-image loop,
    # across shape buckets and a zero-padded final chunk
    eng = _engine(flip=True)
    rng = np.random.default_rng(5)
    sizes = [(100, 140), (100, 140), (90, 90), (100, 140), (64, 120)]
    imgs = [rng.integers(0, 255, s + (3,)).astype(np.uint8) for s in sizes]
    ref = [eng.process(im) for im in imgs]
    progress = []
    got = eng.process_many(imgs, batch_size=2, progress_cb=progress.append)
    # double-buffered drive: progress still strictly increasing, ends at N
    assert progress == sorted(set(progress)) and progress[-1] == len(imgs)
    for (rp, rs), (gp, gs) in zip(ref, got):
        assert len(rp) == len(gp)
        np.testing.assert_allclose(gs, rs, atol=1e-5, rtol=1e-5)
        for a, b in zip(rp, gp):
            np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)


def test_process_many_multiscale_fallback():
    eng = _engine(scale_factors=(0.5, 1.0))
    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)]
    ref = eng.process(imgs[0])
    got = eng.process_many(imgs)[0]
    np.testing.assert_allclose(got[1], ref[1], atol=1e-5)


def test_serving_square_batch_path():
    eng = _engine(project2image=False)
    imgs = np.random.default_rng(2).integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    people, scores, counts = eng.process_batch_square(imgs)
    assert people.shape[0] == 2
    assert counts.shape == (2,)

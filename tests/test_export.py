"""AOT export (jax.export) roundtrip: the serialized serving artifact must
reproduce the live engine bit-for-bit, and a CPU host must be able to lower
TPU artifacts (Mosaic kernels pinned via StaticGroupCfg.interpret)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from litepose_tpu.arch.manager import ArchManager
from litepose_tpu.core.engine import EngineConfig, PoseEngine
from litepose_tpu.core.export import export_engine, load_artifact, save_artifact
from litepose_tpu.core.inference import InferenceFlags
from litepose_tpu.data.flip import flip_index_for
from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
from litepose_tpu.ops.group_ref import GroupParams


def _engine(img=64, assignment="greedy", topk="approx"):
    arch = ArchManager().fixed_sample(reso=img, ratio=0.25)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
        return outs

    flags = InferenceFlags(
        num_joints=14,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=False, flip_index=tuple(flip_index_for("crowd_pose_kpt")),
    )
    group = GroupParams(num_joints=14, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)
    return PoseEngine(
        apply_fn, params, state, flags, group,
        EngineConfig(input_size=img, scale_factors=(1.0,),
                     with_adjust=False, with_refine=False, project2image=False,
                     assignment=assignment, topk_method=topk),
    )


def test_export_args_mode_bitmatches_live_program(tmp_path):
    # weights-as-arguments: the exported program is the SAME HLO the live
    # engine jits, so the artifact must reproduce it bit-for-bit
    import jax.numpy as jnp

    from litepose_tpu.core.export import fused_body

    eng = _engine()
    imgs = np.random.default_rng(3).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)
    fused = fused_body(eng)
    ref_people, ref_scores, ref_n = jax.jit(fused)(eng.params, eng.state, imgs)

    exported = export_engine(eng, batch=2, platform="cpu", bake_params=False)
    path = str(tmp_path / "args_mode.stablehlo")
    info = save_artifact(exported, path)
    assert info.batch == 2 and info.in_hw == (64, 64) and info.nbytes > 0

    serve = load_artifact(path)
    people, scores, n = serve(eng.params, eng.state, imgs)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref_n))
    np.testing.assert_array_equal(np.asarray(people), np.asarray(ref_people))
    np.testing.assert_array_equal(np.asarray(scores), np.asarray(ref_scores))


def test_baked_artifact_roundtrip(tmp_path):
    # self-contained artifact (weights baked): serialize -> deserialize must
    # be output-identical to the in-memory Exported.  (Bit-parity vs the
    # live weights-as-arguments program is NOT asserted: XLA may
    # constant-fold baked weights with a different fp op order, and these
    # random-init heatmaps are noise full of near-ties — see
    # core/export.py docstring.)
    eng = _engine()
    imgs = np.random.default_rng(4).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)
    exported = export_engine(eng, batch=2, platform="cpu")
    ref_people, ref_scores, ref_n = jax.jit(exported.call)(imgs)

    path = str(tmp_path / "baked.stablehlo")
    save_artifact(exported, path)
    serve = load_artifact(path)  # no model code needed from here on
    people, scores, n = serve(imgs)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref_n))
    np.testing.assert_array_equal(np.asarray(people), np.asarray(ref_people))
    np.testing.assert_array_equal(np.asarray(scores), np.asarray(ref_scores))


def test_export_tpu_artifact_from_cpu_host(tmp_path):
    # TPU-targeted lowering must succeed with no TPU attached: Mosaic
    # kernel lowering is pinned by the target platform, not the host
    # backend.  (Runs nothing — artifact-build-in-CI scenario.)
    eng = _engine(assignment="hungarian", topk="exact")
    exported = export_engine(eng, batch=2, platform="tpu")
    assert exported.platforms == ("tpu",)
    blob = exported.serialize()
    assert len(blob) > 0
    mlir = exported.mlir_module()
    assert "tpu_custom_call" in mlir  # the Mosaic kernels really are inside

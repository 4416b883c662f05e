"""End-to-end inference parity: PoseEngine vs a reference-composed pipeline.

The reference flow (valid.py:195-245) is recomposed here from the actual
reference modules (utils.transforms, core.inference) running our converted
weights; our engine must produce identical aggregated heatmaps/tags and
consistent final keypoints.
"""

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.arch.zoo import get_arch
from litepose_tpu.core.engine import EngineConfig, PoseEngine
from litepose_tpu.core.inference import InferenceFlags
from litepose_tpu.data.affine import get_affine_transform, get_multi_scale_size
from litepose_tpu.data.flip import FLIP_CONFIG, flip_index_for
from litepose_tpu.models.layers import Policy
from litepose_tpu.models.litepose import ModelSpec, apply_litepose
from litepose_tpu.models.torch_convert import litepose_from_torch
from litepose_tpu.ops.group_ref import GroupParams


def test_flip_config_matches_reference():
    add_reference_to_path()
    from dataset.transforms.build import FLIP_CONFIG as REF

    for k, v in REF.items():
        assert FLIP_CONFIG[k] == list(v), k


@pytest.mark.parametrize("inv", [False, True])
def test_affine_matches_reference(inv):
    add_reference_to_path()
    from utils import transforms as ref_t

    rng = np.random.default_rng(0)
    for _ in range(10):
        center = rng.uniform(50, 400, 2).astype(np.float32)
        scale = rng.uniform(0.5, 3.0, 2).astype(np.float32)
        rot = float(rng.uniform(-40, 40))
        out = (int(rng.integers(64, 512)), int(rng.integers(64, 512)))
        ours = get_affine_transform(center, scale, rot, out, inv=inv)
        theirs = ref_t.get_affine_transform(center, scale, rot, out, inv=1 if inv else 0)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_multi_scale_size_matches_reference():
    add_reference_to_path()
    from utils import transforms as ref_t

    for h, w in [(200, 300), (480, 640), (640, 480), (333, 333)]:
        img = np.zeros((h, w, 3), np.uint8)
        for cs, ms in [(1.0, 1.0), (2.0, 0.5), (0.5, 0.5)]:
            ours = get_multi_scale_size((h, w), 448, cs, ms)
            theirs = ref_t.get_multi_scale_size(img, 448, cs, ms)
            assert ours[0] == theirs[0]
            np.testing.assert_allclose(ours[1], theirs[1])
            np.testing.assert_allclose(ours[2], theirs[2])


def test_bilinear_resize_matches_torch():
    import jax
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 24, 5)).astype(np.float32)
    ours = np.asarray(jax.image.resize(x, (1, 32, 48, 5), "bilinear"))
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=(32, 48), mode="bilinear", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # non-integer ratio too (stage upsample uses arbitrary target sizes)
    ours = np.asarray(jax.image.resize(x, (1, 37, 53, 5), "bilinear"))
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=(37, 53), mode="bilinear", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


class _RefPipeline:
    """The reference eval pipeline recomposed from reference modules."""

    def __init__(self, torch_model, num_joints, flip_index, input_size, project2image):
        self.model = torch_model
        self.num_joints = num_joints
        self.flip_index = flip_index
        self.input_size = input_size
        self.project2image = project2image

    def heat_tag(self, image_u8):
        heat, tag, center, scale = self.heat_tag_multi(image_u8, [1])
        return heat, tag, center, scale

    def heat_tag_multi(self, image_u8, scale_factors):
        """The reference multi-scale eval loop (valid.py:200-225): per scale
        resize_align_multi_scale -> get_multi_stage_outputs (flip +
        project2image) -> aggregate_results; heatmaps averaged over scales,
        tags kept at scale 1 only; center/scale from the LAST (smallest)
        scale iteration."""
        import torch
        from types import SimpleNamespace

        from core import inference as ref_inf
        from utils import transforms as ref_t

        cfg = self._cfg(scale_factors)
        min_scale = min(scale_factors)
        base_size, _, _ = ref_t.get_multi_scale_size(
            image_u8, self.input_size, 1.0, min_scale
        )
        mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
        std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
        final_heatmaps = None
        tags_list = []
        with torch.no_grad():
            for s in sorted(scale_factors, reverse=True):
                image_resized, center, scale = ref_t.resize_align_multi_scale(
                    image_u8, self.input_size, s, min_scale
                )
                x = torch.from_numpy(
                    image_resized.astype(np.float32).transpose(2, 0, 1) / 255.0
                )
                x = ((x - mean) / std).unsqueeze(0)
                outputs, heatmaps, tags = ref_inf.get_multi_stage_outputs(
                    cfg, self.model, x, True, self.project2image, base_size
                )
                final_heatmaps, tags_list = ref_inf.aggregate_results(
                    cfg, s, final_heatmaps, tags_list, heatmaps, tags
                )
            final_heatmaps = final_heatmaps / float(len(scale_factors))
            tag = torch.cat(tags_list, dim=4)
        return final_heatmaps.numpy(), tag.numpy(), center, scale

    def _cfg(self, scale_factors):
        from types import SimpleNamespace

        return SimpleNamespace(
            DATASET=SimpleNamespace(
                NUM_JOINTS=self.num_joints, DATASET="crowd_pose_kpt", WITH_CENTER=False
            ),
            LOSS=SimpleNamespace(
                WITH_HEATMAPS_LOSS=[True, True], WITH_AE_LOSS=[True, False]
            ),
            TEST=SimpleNamespace(
                WITH_HEATMAPS=[True, True], WITH_AE=[True, False],
                FLIP_TEST=True, PROJECT2IMAGE=self.project2image,
                SCALE_FACTOR=list(scale_factors),
                IGNORE_CENTER=True,
            ),
            MODEL=SimpleNamespace(TAG_PER_JOINT=True),
        )


def _build_pair(arch_name="search-XS", input_size=192, num_joints=14):
    """Reference torch model + our engine with converted weights."""
    import torch

    from test_litepose_torch_parity import _make_ref_model

    arch = get_arch(arch_name).with_img_size(input_size)
    torch.manual_seed(3)
    ref = _make_ref_model(arch.to_dict(), num_joints=num_joints)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    spec = ModelSpec(num_joints=num_joints)
    params, state = litepose_from_torch(ref.state_dict(), spec, arch)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False, policy=Policy.exact())
        return outs

    flags = InferenceFlags(
        num_joints=num_joints,
        with_heatmaps_loss=(True, True),
        with_ae_loss=(True, False),
        test_with_heatmaps=(True, True),
        test_with_ae=(True, False),
        flip_test=True,
        flip_index=tuple(flip_index_for("crowd_pose_kpt")),
        project2image=True,
    )
    group = GroupParams(num_joints=num_joints, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)
    engine = PoseEngine(
        apply_fn, params, state, flags, group,
        EngineConfig(input_size=input_size, scale_factors=(1.0,), project2image=True),
    )
    return ref, engine, flags


@pytest.fixture(scope="module")
def built_pair():
    """One torch-reference + converted-engine build shared by the module's
    e2e tests (the build is the expensive part, ~10 s)."""
    add_reference_to_path()
    return _build_pair()


def test_engine_heat_tag_matches_reference_pipeline(built_pair):
    ref, engine, flags = built_pair
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (150, 210, 3), np.uint8)

    pipe = _RefPipeline(ref, 14, flags.flip_index, 192, True)
    ref_heat, ref_tag, center, scale = pipe.heat_tag(image)

    # drive our engine's jitted inference body on the same resized image
    from litepose_tpu.data.affine import resize_align_multi_scale

    img_resized, c2, s2 = resize_align_multi_scale(image, 192, 1.0, 1.0)
    np.testing.assert_allclose(c2, center)
    np.testing.assert_allclose(s2, scale)
    base_hw = (ref_heat.shape[2], ref_heat.shape[3])
    run = engine._infer_fn((img_resized.shape[0], img_resized.shape[1]), base_hw, True)
    heat, tag = run(engine.params, engine.state, img_resized[None])
    heat = np.asarray(heat).transpose(0, 3, 1, 2)
    tag = np.asarray(tag).transpose(0, 3, 1, 2, 4)

    np.testing.assert_allclose(heat, ref_heat, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(tag, ref_tag, atol=5e-4, rtol=1e-3)


def test_engine_process_end_to_end(built_pair):
    """Full engine.process returns people in source coordinates; verified
    against the numpy oracle decode + inverse affine on identical maps."""
    ref, engine, flags = built_pair
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, (150, 210, 3), np.uint8)

    finals, scores = engine.process(image)
    assert isinstance(finals, list)
    for person in finals:
        assert person.shape[1] >= 3
        # decoded coords must land within the source image bounds (pad slack)
        assert np.all(person[:, 0] > -64) and np.all(person[:, 0] < 210 + 64)
        assert np.all(person[:, 1] > -64) and np.all(person[:, 1] < 150 + 64)
    assert len(scores) == len(finals)


def test_flip_concat_matches_twopass():
    """flip_mode='concat' (one 2B-batch forward) must be bit-identical to the
    reference-style two sequential forwards ('twopass'): convs and eval-mode
    BN are batch-parallel, so batching the mirrored image cannot change
    results (/root/reference/lib/core/inference.py:108-146 runs two passes)."""
    import jax
    import jax.numpy as jnp

    from litepose_tpu.core.inference import make_infer_fn
    from litepose_tpu.models.litepose import init_litepose

    arch = get_arch("auto-XS")
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(3), spec, arch)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
        return outs

    flags = InferenceFlags(
        num_joints=14,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=True, flip_index=tuple(flip_index_for("crowd_pose_kpt")),
    )
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, arch.img_size, arch.img_size, 3)).astype(np.uint8)

    heat_c, tag_c = jax.jit(make_infer_fn(apply_fn, flags))(params, state, imgs)
    heat_t, tag_t = jax.jit(
        make_infer_fn(apply_fn, flags._replace(flip_mode="twopass"))
    )(params, state, imgs)
    assert jnp.array_equal(heat_c, heat_t)
    assert jnp.array_equal(tag_c, tag_t)


def test_decode_layout_commutes_with_projection(built_pair):
    """make_infer_fn(decode_layout=True) — transpose + T-stack at the
    aggregation resolution, then NCHW projection — must be bit-identical to
    the NHWC-project-then-transpose-then-stack path (to_decode_layout after
    projection): bilinear resize acts on the H/W dims with the same 1D
    kernels either way, and stacking commutes with per-plane resize, so the
    orders commute exactly.  decode_layout tags are (B, J, T, H, W)
    (tag_layout="thw"; round 5 — no full-resolution T-minor stack)."""
    import jax

    from litepose_tpu.core.inference import make_infer_fn, to_decode_layout

    ref, engine, flags = built_pair
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (2, 192, 192, 3), np.uint8)

    base = make_infer_fn(engine.apply_fn, flags, project_hw=(192, 192))
    dl = make_infer_fn(engine.apply_fn, flags, project_hw=(192, 192),
                       decode_layout=True)
    heat, tag = jax.jit(base)(engine.params, engine.state, imgs)
    det_ref, tag_ref = to_decode_layout(heat, tag)  # (B, J, H, W, T)
    tag_ref = np.transpose(np.asarray(tag_ref), (0, 1, 4, 2, 3))
    det, tagt = jax.jit(dl)(engine.params, engine.state, imgs)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det_ref))
    np.testing.assert_array_equal(np.asarray(tagt), tag_ref)

    # and without projection (pure transpose reorder)
    base = make_infer_fn(engine.apply_fn, flags)
    dl = make_infer_fn(engine.apply_fn, flags, decode_layout=True)
    heat, tag = jax.jit(base)(engine.params, engine.state, imgs)
    det_ref, tag_ref = to_decode_layout(heat, tag)
    tag_ref = np.transpose(np.asarray(tag_ref), (0, 1, 4, 2, 3))
    det, tagt = jax.jit(dl)(engine.params, engine.state, imgs)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det_ref))
    np.testing.assert_array_equal(np.asarray(tagt), tag_ref)


def test_upsample2x_matches_jax_resize():
    """The interleave 2x upsample (ops/upsample2x.py) must match
    jax.image.resize bilinear to one ulp in fp32 (same 2-tap weights; XLA's
    gather-conv may fma where the interleave form doesn't)."""
    import jax
    import jax.numpy as jnp

    from litepose_tpu.ops.upsample2x import upsample2x_bilinear

    rng = np.random.default_rng(0)
    for shape in [(2, 3, 17, 23), (1, 14, 56, 56), (4, 5, 8, 8)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        ref = jax.image.resize(
            x, (*shape[:-2], shape[-2] * 2, shape[-1] * 2), "bilinear")
        out = upsample2x_bilinear(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6, rtol=2e-6)
    # NHWC axes variant agrees bitwise with the NCHW form
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 5)), jnp.float32)
    a = upsample2x_bilinear(jnp.transpose(x, (0, 3, 1, 2)))
    b = jnp.transpose(upsample2x_bilinear(x, axes=(1, 2)), (0, 3, 1, 2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

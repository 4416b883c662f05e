"""Data pipeline tests: targets, transforms, COCO IO, OKS evaluator."""

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.data.coco_io import (
    CocoAnnotations,
    rle_decode_counts,
    rle_to_mask,
)
from litepose_tpu.data.eval_oks import CROWDPOSE_SIGMAS, KeypointEvaluator, compute_oks
from litepose_tpu.data.targets import HeatmapGenerator, JointsGenerator
from litepose_tpu.data.transforms import TrainTransform, crop_affine_matrix


# --------------------------------------------------------------------------
# target generators vs reference
# --------------------------------------------------------------------------


def _random_joints(rng, n_people=3, num_joints=14, res=64, width=3):
    joints = np.zeros((n_people, num_joints, width))
    joints[..., 0] = rng.uniform(-5, res + 5, (n_people, num_joints))
    joints[..., 1] = rng.uniform(-5, res + 5, (n_people, num_joints))
    joints[..., 2] = rng.integers(0, 3, (n_people, num_joints))
    return joints


def test_heatmap_generator_matches_reference():
    add_reference_to_path()
    from dataset.target_generators import target_generators as ref_tg

    rng = np.random.default_rng(0)
    for res, sigma in [(64, -1), (128, 2)]:
        ours = HeatmapGenerator(res, 14, sigma)
        theirs = ref_tg.HeatmapGenerator(res, 14, sigma)
        for _ in range(3):
            joints = _random_joints(rng, res=res)
            np.testing.assert_allclose(ours(joints), theirs(joints), atol=1e-6)


def test_joints_generator_matches_reference():
    add_reference_to_path()
    from dataset.target_generators import target_generators as ref_tg

    rng = np.random.default_rng(1)
    ours = JointsGenerator(30, 14, 64, True)
    theirs = ref_tg.JointsGenerator(30, 14, 64, True)
    for _ in range(3):
        joints = _random_joints(rng, res=64)
        np.testing.assert_array_equal(ours(joints), theirs(joints))


def test_crop_affine_matrix_matches_reference():
    add_reference_to_path()
    from dataset.transforms.transforms import RandomAffineTransform

    ref = RandomAffineTransform(512, [128], 30, 0.75, 1.5, "short", 40)
    rng = np.random.default_rng(2)
    for _ in range(8):
        center = rng.uniform(0, 400, 2)
        scale = float(rng.uniform(0.5, 3))
        rot = float(rng.uniform(-40, 40))
        res = (128, 128)
        ours = crop_affine_matrix(center, scale, res, rot)
        theirs = ref._get_affine_matrix(center, scale, res, rot)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_train_transform_shapes_and_flip():
    t = TrainTransform(
        input_size=256, output_sizes=[64, 128], flip_prob=1.0,
        flip_index=list(range(14))[::-1], max_rotation=0, min_scale=1.0,
        max_scale=1.0, max_translate=0,
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 300, 3), np.uint8).astype(np.uint8)
    masks = [np.ones((200, 300)), np.ones((200, 300))]
    joints = [np.zeros((2, 14, 3)), np.zeros((2, 14, 3))]
    joints[0][..., :2] = 50
    joints[0][..., 2] = 1
    joints[1][..., :2] = 50
    joints[1][..., 2] = 1
    img2, masks2, joints2 = t(img, masks, joints, rng)
    assert img2.shape == (256, 256, 3)
    assert masks2[0].shape == (64, 64) and masks2[1].shape == (128, 128)
    assert joints2[0].shape == (2, 14, 3)


# --------------------------------------------------------------------------
# RLE
# --------------------------------------------------------------------------


def test_rle_uncompressed_roundtrip():
    rng = np.random.default_rng(0)
    m = (rng.random((23, 31)) > 0.7).astype(np.uint8)
    # encode column-major
    flat = m.T.reshape(-1)
    counts, val, run = [], 0, 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            val = int(v)
            run = 1
    counts.append(run)
    out = rle_to_mask({"size": [23, 31], "counts": counts})
    np.testing.assert_array_equal(out, m)


def test_rle_compressed_decode():
    # encode a counts list with the COCO 6-bit scheme, decode it back
    def encode(counts):
        s = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)

    counts = [5, 3, 10, 2, 40, 1, 100, 7]
    assert rle_decode_counts(encode(counts)) == counts


# --------------------------------------------------------------------------
# OKS evaluator
# --------------------------------------------------------------------------


def _fixture(tmp_path, num_joints=14):
    from fixture_data import make_fixture

    return make_fixture(str(tmp_path), num_joints=num_joints)


def _gt_as_perfect_results(coco, num_joints):
    results = []
    for iid in coco.image_ids:
        for ann in coco.annotations_for(iid):
            if ann.get("num_keypoints", 0) == 0:
                continue
            kp = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
            kp[:, 2] = 0.9
            results.append(
                {
                    "image_id": iid,
                    "category_id": 1,
                    "keypoints": [float(v) for v in kp.reshape(-1)],
                    "score": 0.9,
                }
            )
    return results


def test_oks_perfect_predictions_ap1(tmp_path):
    ann_path, _ = _fixture(tmp_path)
    coco = CocoAnnotations(ann_path)
    ev = KeypointEvaluator(coco, style="crowdpose")
    stats = ev.evaluate(_gt_as_perfect_results(coco, 14))
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP .5"] == pytest.approx(1.0)


def test_oks_missing_half_lowers_ap(tmp_path):
    ann_path, _ = _fixture(tmp_path)
    coco = CocoAnnotations(ann_path)
    results = _gt_as_perfect_results(coco, 14)
    partial = results[::2]
    ev = KeypointEvaluator(coco, style="crowdpose")
    stats = ev.evaluate(partial)
    assert 0.2 < stats["AP"] < 0.9
    assert stats["AR"] < 1.0


def test_oks_garbage_predictions_ap0(tmp_path):
    ann_path, _ = _fixture(tmp_path)
    coco = CocoAnnotations(ann_path)
    results = _gt_as_perfect_results(coco, 14)
    for r in results:
        kp = np.array(r["keypoints"]).reshape(-1, 3)
        kp[:, :2] += 500.0
        r["keypoints"] = [float(v) for v in kp.reshape(-1)]
    ev = KeypointEvaluator(coco, style="crowdpose")
    stats = ev.evaluate(results)
    assert stats["AP"] == pytest.approx(0.0)


def test_oks_formula_manual():
    gt = {
        "keypoints": [10, 10, 2] + [0, 0, 0] * 13,
        "area": 100.0,
        "bbox": [5, 5, 10, 10],
        "num_keypoints": 1,
    }
    det = np.zeros((1, 14, 3))
    det[0, 0] = [12, 10, 1]
    ious = compute_oks(det, [gt], CROWDPOSE_SIGMAS)
    e = (2.0**2) / ((CROWDPOSE_SIGMAS[0] * 2) ** 2) / (100.0 + np.spacing(1)) / 2
    assert ious[0, 0] == pytest.approx(np.exp(-e))


def test_coco_style_area_buckets(tmp_path):
    ann_path, _ = _fixture(tmp_path, num_joints=17)
    coco = CocoAnnotations(ann_path)
    ev = KeypointEvaluator(coco, style="coco")
    stats = ev.evaluate(_gt_as_perfect_results(coco, 17))
    assert stats["AP"] == pytest.approx(1.0)
    assert "AP (M)" in stats and "AP (L)" in stats


def test_crowdpose_crowdindex_buckets(tmp_path):
    ann_path, _ = _fixture(tmp_path)
    coco = CocoAnnotations(ann_path)
    ev = KeypointEvaluator(coco, style="crowdpose")
    stats = ev.evaluate(_gt_as_perfect_results(coco, 14))
    assert "AP (E)" in stats and "AP (M)" in stats and "AP (H)" in stats


# --------------------------------------------------------------------------
# full pipeline over the fixture
# --------------------------------------------------------------------------


def test_train_pipeline_and_iterator(tmp_path):
    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.data.dataset import PoseDataset, TrainPipeline, make_batch_iterator

    ann_path, img_dir = _fixture(tmp_path)
    cfg = default_config()
    cfg.defrost()
    cfg.DATASET.DATASET = "crowd_pose_kpt"
    cfg.DATASET.NUM_JOINTS = 14
    cfg.DATASET.INPUT_SIZE = 128
    cfg.DATASET.OUTPUT_SIZE = [32, 64]
    cfg.DATASET.SIGMA = 2
    ds = PoseDataset(ann_path, img_dir, num_joints=14, style="crowdpose")
    pipe = TrainPipeline(ds, cfg, seed=0)
    img, heatmaps, masks, joints = pipe.get(0)
    assert img.shape == (128, 128, 3)
    assert heatmaps[0].shape == (14, 32, 32) and heatmaps[1].shape == (14, 64, 64)
    assert masks[0].shape == (32, 32)
    assert joints[0].shape == (30, 14, 2)
    # ignore mask contains the crowd region on image 1
    _, _, masks1, _ = pipe.get(1)

    it = make_batch_iterator(pipe, batch_size=2, epoch=0)
    batch = next(it)
    assert batch["images"].shape == (2, 128, 128, 3)
    assert batch["heatmaps"][0].shape == (2, 14, 32, 32)
    assert batch["joints"][1].shape == (2, 30, 14, 2)
    # determinism: same (seed, epoch, idx) -> same sample
    a = pipe.get(2)
    b = pipe.get(2)
    np.testing.assert_array_equal(a[0], b[0])


def test_scale_aware_heatmap_generator_matches_reference():
    add_reference_to_path()
    from dataset.target_generators import target_generators as ref_tg

    from litepose_tpu.data.targets import ScaleAwareHeatmapGenerator

    rng = np.random.default_rng(5)
    ours = ScaleAwareHeatmapGenerator(64, 14)
    theirs = ref_tg.ScaleAwareHeatmapGenerator(64, 14)
    joints = _random_joints(rng, res=64, width=4)
    joints[..., 3] = rng.uniform(1.0, 3.0, joints.shape[:2])
    np.testing.assert_allclose(ours(joints), theirs(joints), atol=1e-6)

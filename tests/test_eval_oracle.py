"""Property test: KeypointEvaluator == canonical COCOeval keypoint algorithm.

Fuzzes randomized detection/GT scenes (score ties, crowd flags, invisible
joints, empty images, out-of-bucket areas) and asserts every summary stat
our evaluator emits is identical to the oracle transcription of
pycocotools' COCOeval (tests/oracle_cocoeval.py) — the algorithm behind
the reference's published numbers
(``/root/reference/lib/dataset/COCODataset.py:295-309``).
"""

import numpy as np
import pytest

from litepose_tpu.data.eval_oks import COCO_SIGMAS, CROWDPOSE_SIGMAS, KeypointEvaluator

from oracle_cocoeval import oracle_evaluate, oracle_evaluate_crowdpose


class FakeGT:
    def __init__(self, gts_by_img, infos=None):
        self._g = gts_by_img
        self._i = infos or {}

    @property
    def image_ids(self):
        return sorted(self._g.keys())

    def annotations_for(self, iid):
        return self._g[iid]

    def image_info(self, iid):
        return self._i.get(iid, {})


def _rand_scene(rng, k, n_imgs):
    gts_by_img, dts_by_img, results = {}, {}, []
    for iid in range(1, n_imgs + 1):
        n_gt = int(rng.integers(0, 6))
        gts = []
        for _ in range(n_gt):
            cx, cy = rng.uniform(20, 180, 2)
            spread = rng.uniform(5, 40)
            xs = cx + rng.normal(0, spread, k)
            ys = cy + rng.normal(0, spread, k)
            vs = rng.choice([0, 1, 2], k, p=[0.25, 0.35, 0.4])
            if rng.random() < 0.1:
                vs[:] = 0  # fully invisible person
            kp = np.stack([xs, ys, vs], 1).reshape(-1).astype(np.float64)
            w, h = rng.uniform(10, 150, 2)
            # cover all three area buckets, incl. boundary-ish values
            area = float(rng.choice([w * h, 20.0**2, 50.0**2, 120.0**2]))
            gts.append({
                "keypoints": kp.tolist(),
                "area": area,
                "bbox": [cx - w / 2, cy - h / 2, w, h],
                "iscrowd": int(rng.random() < 0.12),
                "num_keypoints": int(np.count_nonzero(vs > 0)),
            })
        n_dt = int(rng.integers(0, 9))
        dts = []
        for _ in range(n_dt):
            if gts and rng.random() < 0.6:
                # perturbation of a random gt -> plausible match
                g = np.asarray(gts[int(rng.integers(len(gts)))]["keypoints"])
                g = g.reshape(-1, 3).copy()
                g[:, :2] += rng.normal(0, rng.uniform(0.5, 15), (k, 2))
                g[:, 2] = rng.uniform(0.1, 1.0, k)
                kp = g.reshape(-1)
            else:
                kp = np.stack([
                    rng.uniform(0, 200, k), rng.uniform(0, 200, k),
                    rng.uniform(0.1, 1.0, k),
                ], 1).reshape(-1)
            # quantize scores to force ties
            score = round(float(rng.uniform(0.05, 1.0)), 1)
            dts.append({"keypoints": kp.tolist(), "score": score})
            results.append({"image_id": iid, "keypoints": kp.tolist(), "score": score})
        gts_by_img[iid] = gts
        dts_by_img[iid] = dts
    return gts_by_img, dts_by_img, results


@pytest.mark.parametrize("seed", range(20))
def test_coco_ap_matches_cocoeval_oracle(seed):
    rng = np.random.default_rng(seed)
    k = len(COCO_SIGMAS)
    # 6 random scenes per seed -> 120 randomized cases total
    for rep in range(6):
        n_imgs = int(rng.integers(1, 7))
        gts_by_img, dts_by_img, results = _rand_scene(rng, k, n_imgs)
        ours = KeypointEvaluator(FakeGT(gts_by_img), style="coco").evaluate(results)
        ref = oracle_evaluate(gts_by_img, dts_by_img, COCO_SIGMAS)
        for key in ("AP", "AP .5", "AP .75", "AR", "AR .5", "AR .75",
                    "AP (M)", "AP (L)"):
            assert ours[key] == pytest.approx(ref[key], abs=1e-12), (
                f"seed={seed} rep={rep} stat {key}: ours={ours[key]} "
                f"oracle={ref[key]}"
            )


def test_crowdpose_sigmas_protocol_values():
    # crowdposetools: [.79,.79,.72,.72,.62,.62,1.07,1.07,.87,.87,.89,.89,.79,.79]/10
    expect = np.array(
        [.79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89, .79, .79]
    ) / 10.0
    np.testing.assert_allclose(CROWDPOSE_SIGMAS, expect)


def test_crowdpose_main_stats_match_oracle():
    rng = np.random.default_rng(123)
    k = len(CROWDPOSE_SIGMAS)
    gts_by_img, dts_by_img, results = _rand_scene(rng, k, 5)
    infos = {i: {"crowdIndex": rng.uniform(0, 1)} for i in gts_by_img}
    ours = KeypointEvaluator(
        FakeGT(gts_by_img, infos), style="crowdpose"
    ).evaluate(results)
    ref = oracle_evaluate(gts_by_img, dts_by_img, CROWDPOSE_SIGMAS)
    for key in ("AP", "AP .5", "AP .75", "AR"):
        assert ours[key] == pytest.approx(ref[key], abs=1e-12)


@pytest.mark.parametrize("seed", range(12))
def test_crowdpose_crowdindex_buckets_match_oracle(seed):
    """All CrowdPose summary stats — incl. AP(E)/AP(M)/AP(H) crowdIndex
    buckets — match the crowdposetools transcription
    (reference: /root/reference/lib/dataset/CrowdPoseDataset.py:288-293).
    crowdIndex values deliberately include the 0.1/0.8 boundaries so the
    bucket convention is pinned."""
    rng = np.random.default_rng(1000 + seed)
    k = len(CROWDPOSE_SIGMAS)
    for rep in range(4):
        n_imgs = int(rng.integers(2, 8))
        gts_by_img, dts_by_img, results = _rand_scene(rng, k, n_imgs)
        cis = {
            i: float(rng.choice([0.0, 0.05, 0.1, 0.3, 0.65, 0.8, 0.9, 1.0]))
            for i in gts_by_img
        }
        infos = {i: {"crowdIndex": cis[i]} for i in gts_by_img}
        ours = KeypointEvaluator(
            FakeGT(gts_by_img, infos), style="crowdpose"
        ).evaluate(results)
        ref = oracle_evaluate_crowdpose(gts_by_img, dts_by_img, CROWDPOSE_SIGMAS, cis)
        for key in ("AP", "AP .5", "AP .75", "AR", "AR .5", "AR .75",
                    "AP (E)", "AP (M)", "AP (H)"):
            assert ours[key] == pytest.approx(ref[key], abs=1e-12), (
                f"seed={seed} rep={rep} stat {key}: ours={ours[key]} "
                f"oracle={ref[key]}"
            )

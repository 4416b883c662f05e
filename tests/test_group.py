"""Grouping parity tests: device kernels vs numpy oracle vs reference.

Three layers of evidence:
  1. jittable Hungarian vs scipy on random matrices (incl. padded costs),
  2. numpy ``group_ref`` vs the actual reference ``HeatmapParser`` (imported
     from /root/reference with a scipy-backed munkres shim),
  3. on-device ``parse_batch`` vs the numpy oracle.
"""

import sys
import types

import numpy as np
import pytest

from conftest import add_reference_to_path

from litepose_tpu.ops import group_ref
from litepose_tpu.ops.group_ref import GroupParams


def _synthetic_scene(seed, K=14, H=48, W=48, n_people=3, T=1):
    """Random multi-person heatmaps + tag maps with distinct per-person tags."""
    rng = np.random.default_rng(seed)
    det = rng.uniform(0, 0.02, (K, H, W)).astype(np.float32)
    tag = rng.uniform(-0.05, 0.05, (K, H, W, T)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for pid in range(n_people):
        ptag = (pid + 1) * 2.0 + rng.normal(0, 0.05)
        for k in range(K):
            if rng.uniform() < 0.25:
                continue  # missing joint
            cx, cy = rng.uniform(4, W - 4), rng.uniform(4, H - 4)
            amp = rng.uniform(0.4, 1.0)
            g = amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0**2))
            det[k] = np.maximum(det[k], g.astype(np.float32))
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 3.0**2)) > 0.3
            tag[k, :, :, 0] = np.where(blob, ptag + rng.normal(0, 0.02), tag[k, :, :, 0])
    return det, tag


# --------------------------------------------------------------------------
# 1. Hungarian
# --------------------------------------------------------------------------


@pytest.mark.parametrize("n", [3, 8, 30])
def test_hungarian_matches_scipy_cost(n):
    from litepose_tpu.ops.hungarian import hungarian, hungarian_np

    rng = np.random.default_rng(0)
    for trial in range(6):
        cost = rng.normal(0, 100, (n, n)).astype(np.float32)
        if trial % 2 == 0:
            # grouping-style: some 1e10 pad columns, some all-zero rows
            cost[:, rng.integers(0, n)] = 1e10
            cost[rng.integers(0, n), :] = 0.0
        ours = np.asarray(hungarian(cost))
        ref = hungarian_np(cost)
        # optimal assignments may differ on ties; total cost must match
        total_ours = cost[np.arange(n), ours].sum()
        total_ref = cost[np.arange(n), ref].sum()
        assert sorted(ours) == list(range(n))  # is a permutation
        np.testing.assert_allclose(total_ours, total_ref, rtol=1e-6)


# --------------------------------------------------------------------------
# 2. numpy oracle vs the reference HeatmapParser
# --------------------------------------------------------------------------


def _install_munkres_shim():
    """munkres isn't installed; back the reference import with scipy,
    reproducing munkres' square zero-padding semantics."""
    if "munkres" in sys.modules:
        return
    from scipy.optimize import linear_sum_assignment

    class Munkres:
        def compute(self, matrix):
            a = np.asarray(matrix, dtype=np.float64)
            n = max(a.shape)
            sq = np.zeros((n, n))
            sq[: a.shape[0], : a.shape[1]] = a
            rows, cols = linear_sum_assignment(sq)
            # munkres.compute() excludes pairs outside the original
            # (pre-padding) matrix bounds
            return sorted(
                (r, c)
                for r, c in zip(rows.tolist(), cols.tolist())
                if r < a.shape[0] and c < a.shape[1]
            )

    mod = types.ModuleType("munkres")
    mod.Munkres = Munkres
    sys.modules["munkres"] = mod


def _ref_parser(p: GroupParams):
    add_reference_to_path()
    _install_munkres_shim()
    from types import SimpleNamespace

    from core.group import HeatmapParser  # reference lib/core/group.py

    cfg = SimpleNamespace(
        DATASET=SimpleNamespace(
            NUM_JOINTS=p.num_joints,
            MAX_NUM_PEOPLE=p.max_num_people,
            WITH_CENTER=False,
        ),
        TEST=SimpleNamespace(
            DETECTION_THRESHOLD=p.detection_threshold,
            TAG_THRESHOLD=p.tag_threshold,
            USE_DETECTION_VAL=p.use_detection_val,
            IGNORE_TOO_MUCH=p.ignore_too_much,
            IGNORE_CENTER=True,
            NMS_KERNEL=p.nms_kernel,
            NMS_PADDING=p.nms_padding,
        ),
        MODEL=SimpleNamespace(TAG_PER_JOINT=True),
    )
    return HeatmapParser(cfg)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_numpy_oracle_matches_reference_parse(seed):
    import torch

    p = GroupParams(num_joints=14, detection_threshold=0.1, nms_kernel=5, nms_padding=2)
    det, tag = _synthetic_scene(seed)
    parser = _ref_parser(p)
    ref_ans, ref_scores = parser.parse(
        torch.from_numpy(det[None]), torch.from_numpy(tag[None]),
        adjust=True, refine=True,
    )
    ref_people = np.asarray(ref_ans[0])

    ours_people, ours_scores = group_ref.parse_np(det, tag, p)

    assert ours_people.shape[0] == ref_people.shape[0]
    np.testing.assert_allclose(ours_people, ref_people, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours_scores), np.asarray([float(s) for s in ref_scores]), atol=1e-5
    )


# --------------------------------------------------------------------------
# 3. device parse vs numpy oracle
# --------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_parse_matches_numpy(seed):
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch

    p = GroupParams(num_joints=14, detection_threshold=0.1, nms_kernel=5, nms_padding=2)
    det, tag = _synthetic_scene(seed, n_people=4)
    cfg = StaticGroupCfg.from_params(p)

    people_np, scores_np = group_ref.parse_np(det, tag, p)
    people_dev, scores_dev, n_dev = parse_batch(det[None], tag[None], cfg)
    people_dev = np.asarray(people_dev[0])
    scores_dev = np.asarray(scores_dev[0])
    n = int(n_dev[0])

    assert n == people_np.shape[0]
    np.testing.assert_allclose(people_dev[:n], people_np, atol=1e-3)
    np.testing.assert_allclose(scores_dev[:n], np.asarray(scores_np), atol=1e-4)
    # empty slots are all-zero
    assert np.all(people_dev[n:] == 0)


def test_device_parse_empty_image():
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch

    p = GroupParams(num_joints=14, detection_threshold=0.5)
    cfg = StaticGroupCfg.from_params(p)
    det = np.zeros((1, 14, 32, 32), np.float32)
    tag = np.zeros((1, 14, 32, 32, 1), np.float32)
    people, scores, n = parse_batch(det, tag, cfg)
    assert int(n[0]) == 0
    assert np.all(np.asarray(people) == 0)


@pytest.mark.parametrize("seed", [0, 1])
def test_device_parse_thw_tag_layout(seed):
    """parse_batch(tag_layout='thw') — the decode-layout fast path's
    (B,K,T,H,W) tags — must be bit-identical to the default (B,K,H,W,T)
    form through the full decode (top-k gather, grouping, refine)."""
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch

    p = GroupParams(num_joints=14, detection_threshold=0.1, nms_kernel=5,
                    nms_padding=2)
    det, tag = _synthetic_scene(seed, n_people=4)
    # two tag features (the flip-test protocol shape)
    tag2 = np.concatenate([tag, tag * 0.9 + 0.01], axis=-1)
    cfg = StaticGroupCfg.from_params(p)

    ph, sh, nh = parse_batch(det[None], tag2[None], cfg)
    tag_t = np.ascontiguousarray(np.transpose(tag2[None], (0, 1, 4, 2, 3)))
    pt, st, nt = parse_batch(det[None], tag_t, cfg, tag_layout="thw")
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(pt))
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(st))
    np.testing.assert_array_equal(np.asarray(nh), np.asarray(nt))


@pytest.mark.slow  # ~43s; the 14-joint device-parse parity stays in the fast set
def test_device_parse_17_joints_coco_order():
    """COCO joint count exercises the non-trivial grouping order."""
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch

    p = GroupParams(num_joints=17, detection_threshold=0.1,
                    nms_kernel=5, nms_padding=2)
    assert p.joint_order[:4] == [0, 1, 2, 3]
    assert 11 in p.joint_order and len(p.joint_order) == 17
    det, tag = _synthetic_scene(11, K=17, n_people=3)
    cfg = StaticGroupCfg.from_params(p)
    people_np, scores_np = group_ref.parse_np(det, tag, p)
    people_dev, scores_dev, n_dev = parse_batch(det[None], tag[None], cfg)
    n = int(n_dev[0])
    assert n == people_np.shape[0]
    np.testing.assert_allclose(np.asarray(people_dev[0])[:n], people_np, atol=1e-3)

"""Synthetic COCO-format pose scenes (stick figures on textured noise).

Used three ways:
  * test fixture datasets (tests/fixture_data.py re-exports ``make_fixture``);
  * ``tools/make_bench_ckpt.py`` — overfit a model on a synthetic set so
    ``bench.py`` can measure the decode under *trained* peak statistics at
    the protocol detection threshold (instead of calibrating a fake
    threshold against random-init noise);
  * demo inputs when no real dataset is mounted.

The reference ships no equivalent (it assumes the real CrowdPose/COCO
archives, ``/root/reference/lib/dataset/COCODataset.py:55-76``); this is
infrastructure for dataset-free environments.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np


def _person_keypoints(rng, cx, cy, size, num_joints):
    """Plausible joint layout around a center; all visible."""
    kps = []
    for j in range(num_joints):
        ang = 2 * np.pi * j / num_joints
        r = size * (0.2 + 0.3 * rng.random())
        x = cx + r * np.cos(ang)
        y = cy + r * np.sin(ang)
        kps.extend([float(x), float(y), 2])
    return kps


def _joint_color(j: int) -> Tuple[int, int, int]:
    """Distinct, bright RGB color per joint index.

    Joints must be visually distinguishable: if every joint renders as the
    same mark, a trained model fires each joint channel on *every* mark
    (people x joints candidate peaks), which saturates the decoder and makes
    bench decode load unrealistic."""
    return (80 + (j * 97) % 176, 80 + (j * 57 + 41) % 176, 80 + (j * 151 + 83) % 176)


def _draw_person(img, pts):
    """Render one person: skeleton lines + per-joint colored dots."""
    import cv2

    n = len(pts)
    for j in range(n):
        x0, y0 = int(pts[j][0]), int(pts[j][1])
        x1, y1 = int(pts[(j + 1) % n][0]), int(pts[(j + 1) % n][1])
        cv2.line(img, (x0, y0), (x1, y1), (110, 110, 110), 1)
    for j, (x, y, _) in enumerate(pts):
        cv2.circle(img, (int(x), int(y)), 3, _joint_color(j), -1)


def _rle_encode(mask):
    """Column-major RLE (uncompressed list form) of a binary mask."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    counts = []
    val = 0
    run = 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(int(run))
            val = int(v)
            run = 1
    counts.append(int(run))
    return counts


def make_fixture(tmpdir, num_joints=14, n_images=4, h=160, w=200, seed=0,
                 with_edge_cases=True, n_people_range=None, size_range=None):
    """Write a synthetic COCO-format dataset (images + annotations.json) to
    ``tmpdir``; return (ann_file_path, image_dir).

    with_edge_cases: include one crowd-RLE region and one keypoint-less
    instance (exercises the ignore-mask path); disable for clean
    training-only sets.
    n_people_range/size_range: (lo, hi) overrides for scene density and
    person size — ``tools/make_bench_ckpt.py`` matches them to
    ``bench_scene_batch`` statistics so the bench checkpoint's peaks are
    in-distribution (defaults preserve the historical test fixtures).
    """
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(tmpdir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img = (rng.uniform(0, 60, (h, w, 3))).astype(np.uint8)
        file_name = f"img_{i:06d}.jpg"
        if n_people_range is not None:
            n_people = int(rng.integers(n_people_range[0], n_people_range[1] + 1))
        else:
            n_people = 1 + i % 3
        for p in range(n_people):
            cx = rng.uniform(40, w - 40)
            cy = rng.uniform(40, h - 40)
            size = rng.uniform(*(size_range or (30, 60)))
            kps = _person_keypoints(rng, cx, cy, size, num_joints)
            pts = np.array(kps).reshape(-1, 3)
            # draw the "person" so images aren't pure noise
            _draw_person(img, pts)
            x0, y0 = pts[:, 0].min(), pts[:, 1].min()
            x1, y1 = pts[:, 0].max(), pts[:, 1].max()
            bbox = [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]
            poly = [x0, y0, x1, y0, x1, y1, x0, y1]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": 1,
                    "keypoints": kps,
                    "num_keypoints": num_joints,
                    "bbox": bbox,
                    "area": float(bbox[2] * bbox[3]),
                    "iscrowd": 0,
                    "segmentation": [[float(v) for v in poly]],
                }
            )
            ann_id += 1
        if i == 1 and with_edge_cases:
            # a crowd region (RLE) exercising the ignore-mask path
            m = np.zeros((h, w), np.uint8)
            m[10:40, 10:60] = 1
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": 1,
                    "keypoints": [0] * (num_joints * 3),
                    "num_keypoints": 0,
                    "bbox": [10, 10, 50, 30],
                    "area": 1500.0,
                    "iscrowd": 1,
                    "segmentation": {"size": [h, w], "counts": _rle_encode(m)},
                }
            )
            ann_id += 1
        if i == 2 and with_edge_cases:
            # keypoint-less instance (polygon) — also masked out
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i,
                    "category_id": 1,
                    "keypoints": [0] * (num_joints * 3),
                    "num_keypoints": 0,
                    "bbox": [100, 100, 40, 30],
                    "area": 1200.0,
                    "iscrowd": 0,
                    "segmentation": [[100, 100, 140, 100, 140, 130, 100, 130]],
                }
            )
            ann_id += 1
        cv2.imwrite(os.path.join(tmpdir, file_name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append(
            {
                "id": i,
                "file_name": file_name,
                "height": h,
                "width": w,
                "crowdIndex": float(i) / n_images,
            }
        )

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person", "keypoints": [str(j) for j in range(num_joints)]}
        ],
    }
    ann_path = os.path.join(tmpdir, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, tmpdir


def bench_scene_batch(batch: int, size: int, num_joints: int = 14,
                      seed: int = 7, return_gt: bool = False):
    """Deterministic uint8 RGB batch of multi-person stick-figure scenes at
    ``size`` x ``size`` — the bench input when a trained checkpoint is
    available (peaks land where people are, so decode load is realistic).

    return_gt=True also returns, per image, the list of drawn people as
    (num_joints, 3) keypoint arrays — real ground truth for metric-level
    parity gates (tests/test_e2e_map_parity.py)."""
    import cv2

    rng = np.random.default_rng(seed)
    out = np.empty((batch, size, size, 3), np.uint8)
    gts: List[List[np.ndarray]] = []
    for b in range(batch):
        img = rng.uniform(0, 60, (size, size, 3)).astype(np.uint8)
        # density/size matched to the make_bench_ckpt training fixture
        # (scaled by size/512): decode load must be in-distribution for the
        # trained checkpoint or peak amplitudes collapse
        n_people = int(rng.integers(2, 7))
        people = []
        for _ in range(n_people):
            cx = rng.uniform(40, size - 40)
            cy = rng.uniform(40, size - 40)
            psize = rng.uniform(30, 100) * size / 512.0
            kps = np.asarray(
                _person_keypoints(rng, cx, cy, psize, num_joints)
            ).reshape(-1, 3)
            _draw_person(img, kps)
            people.append(kps)
        out[b] = img
        gts.append(people)
    return (out, gts) if return_gt else out

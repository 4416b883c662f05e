"""Host (numpy) reference implementation of associative-embedding grouping.

This mirrors the exact decode semantics of the reference pipeline
(``/root/reference/lib/core/group.py``) and serves three purposes:
  1. the oracle for our on-device (JAX) grouping kernels,
  2. a CPU fallback path for deployments without an accelerator,
  3. documentation of the decode contract.

Decode contract (per image):
  * ``top_k``: max-pool NMS over heatmaps, per-joint top-M peaks with their
    tag vectors (group.py:131-176).
  * ``match_by_tag``: iterate joints in ``joint_order``; greedily cluster
    detections by tag value using min-cost assignment on
    ``round(||tag - cluster_mean_tag||) * 100 - det_score``, padding extra
    columns with 1e10; a detection whose best match exceeds
    ``tag_threshold`` spawns a new person (group.py:26-97).
  * ``adjust``: +-0.25 px toward the larger neighbor, then +0.5 center
    offset (group.py:178-197).
  * scores: per-person mean joint score (taken after adjust, before
    refine — group.py:275).
  * ``refine``: for each person, fill missing joints from the argmax of
    ``det - round(||tag - person_mean_tag||)`` (group.py:199-267).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

# COCO grouping order (torso -> limbs); CrowdPose (14 joints) uses the same
# table truncated by indexing only its first 14 entries at runtime
# (/root/reference/lib/core/group.py:113-120).
JOINT_ORDER_17 = [i - 1 for i in (1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16, 17)]
JOINT_ORDER_18 = [i - 1 for i in (18, 1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16, 17)]


def joint_order_for(num_joints: int, with_center_kept: bool = False) -> List[int]:
    order = JOINT_ORDER_18 if with_center_kept else JOINT_ORDER_17
    return [j for j in order if j < num_joints][:num_joints]


@dataclasses.dataclass
class GroupParams:
    num_joints: int = 14
    max_num_people: int = 30
    detection_threshold: float = 0.1
    tag_threshold: float = 1.0
    use_detection_val: bool = True
    ignore_too_much: bool = False
    nms_kernel: int = 5
    nms_padding: int = 2
    joint_order: Optional[Sequence[int]] = None
    # capacity of the fixed-size device cluster table (>= max_num_people)
    max_clusters: int = 40

    def __post_init__(self):
        if self.joint_order is None:
            self.joint_order = joint_order_for(self.num_joints)

    @staticmethod
    def from_config(cfg) -> "GroupParams":
        num_joints = cfg.DATASET.NUM_JOINTS
        with_center_kept = bool(cfg.DATASET.WITH_CENTER and not cfg.TEST.IGNORE_CENTER)
        if cfg.DATASET.WITH_CENTER and cfg.TEST.IGNORE_CENTER:
            num_joints -= 1
        return GroupParams(
            num_joints=num_joints,
            max_num_people=cfg.DATASET.MAX_NUM_PEOPLE,
            detection_threshold=cfg.TEST.DETECTION_THRESHOLD,
            tag_threshold=cfg.TEST.TAG_THRESHOLD,
            use_detection_val=cfg.TEST.USE_DETECTION_VAL,
            ignore_too_much=cfg.TEST.IGNORE_TOO_MUCH,
            nms_kernel=cfg.TEST.NMS_KERNEL,
            nms_padding=cfg.TEST.NMS_PADDING,
            joint_order=joint_order_for(num_joints, with_center_kept),
        )


# --------------------------------------------------------------------------
# numpy pipeline
# --------------------------------------------------------------------------


def nms_np(det: np.ndarray, kernel: int, padding: int) -> np.ndarray:
    """Keep only local maxima of a (K, H, W) heatmap stack (max-pool
    equality NMS, stride 1)."""
    K, H, W = det.shape
    padded = np.pad(det, ((0, 0), (padding, padding), (padding, padding)), constant_values=-np.inf)
    # sliding window max
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(padded, (kernel, kernel), axis=(1, 2))
    maxm = win.max(axis=(-2, -1))
    maxm = maxm[:, : H, : W]
    return det * (maxm == det)


def top_k_np(det: np.ndarray, tag: np.ndarray, p: GroupParams):
    """Per-joint top-M peak extraction. det: (K,H,W); tag: (K,H,W,T).

    Returns (tag_k (K,M,T), loc_k (K,M,2) xy, val_k (K,M))."""
    K, H, W = det.shape
    M = p.max_num_people
    det_n = nms_np(det, p.nms_kernel, p.nms_padding).reshape(K, -1)
    # torch.topk returns values sorted descending
    ind = np.argsort(-det_n, axis=1, kind="stable")[:, :M]
    val_k = np.take_along_axis(det_n, ind, axis=1)
    T = tag.shape[-1]
    tag_flat = tag.reshape(K, H * W, T)
    tag_k = np.stack([np.take_along_axis(tag_flat[..., t], ind, axis=1) for t in range(T)], axis=2)
    x = ind % W
    y = ind // W
    loc_k = np.stack([x, y], axis=2).astype(np.float32)
    return tag_k, loc_k, val_k


def match_by_tag_np(tag_k, loc_k, val_k, p: GroupParams) -> np.ndarray:
    """Greedy tag clustering, one image. Returns (n_people, K, 3+T)."""
    K, M, T = tag_k.shape
    default = np.zeros((p.num_joints, 3 + T), np.float32)

    cluster_joints: List[np.ndarray] = []  # (num_joints, 3+T) per person
    cluster_tags: List[List[np.ndarray]] = []  # list of tag vectors per person

    for i, idx in enumerate(p.joint_order):
        tags = tag_k[idx]
        joints = np.concatenate([loc_k[idx], val_k[idx, :, None], tags], axis=1)
        mask = joints[:, 2] > p.detection_threshold
        tags = tags[mask]
        joints = joints[mask]
        if joints.shape[0] == 0:
            continue

        if i == 0 or not cluster_joints:
            for t, j in zip(tags, joints):
                cluster_joints.append(default.copy())
                cluster_joints[-1][idx] = j
                cluster_tags.append([t])
            continue

        grouped = cluster_joints[: p.max_num_people]
        grouped_tags = np.array([np.mean(ts, axis=0) for ts in cluster_tags[: p.max_num_people]])
        if p.ignore_too_much and len(grouped) == p.max_num_people:
            continue

        diff = np.linalg.norm(joints[:, None, 3:] - grouped_tags[None], ord=2, axis=2)
        diff_saved = diff.copy()
        if p.use_detection_val:
            diff = np.round(diff) * 100 - joints[:, 2:3]

        num_added, num_grouped = diff.shape
        if num_added > num_grouped:
            diff = np.concatenate(
                [diff, np.full((num_added, num_added - num_grouped), 1e10)], axis=1
            )
        # munkres pads rows with zeros to square; scipy's rectangular solver
        # (rows <= cols) is equivalent for the real rows.
        rows, cols = linear_sum_assignment(diff)
        for row, col in zip(rows, cols):
            if (
                row < num_added
                and col < num_grouped
                and diff_saved[row, col] < p.tag_threshold
            ):
                cluster_joints[col][idx] = joints[row]
                cluster_tags[col].append(tags[row])
            else:
                cluster_joints.append(default.copy())
                cluster_joints[-1][idx] = joints[row]
                cluster_tags.append([tags[row]])

    if not cluster_joints:
        return np.zeros((0, p.num_joints, 3 + T), np.float32)
    return np.stack(cluster_joints).astype(np.float32)


def adjust_np(people: np.ndarray, det: np.ndarray) -> np.ndarray:
    """Quarter-pixel adjustment toward the larger neighbor + 0.5 offset."""
    people = people.copy()
    K, H, W = det.shape
    for person in people:
        for jid, joint in enumerate(person):
            if joint[2] > 0:
                x, y = joint[0:2]
                xi, yi = int(x), int(y)
                hm = det[jid]
                x = x + (0.25 if hm[yi, min(xi + 1, W - 1)] > hm[yi, max(xi - 1, 0)] else -0.25)
                y = y + (0.25 if hm[min(yi + 1, H - 1), xi] > hm[max(yi - 1, 0), xi] else -0.25)
                person[jid, 0] = x + 0.5
                person[jid, 1] = y + 0.5
    return people


def refine_np(det: np.ndarray, tag: np.ndarray, keypoints: np.ndarray) -> np.ndarray:
    """Fill missing joints from the tag-penalized heatmap argmax."""
    if tag.ndim == 3:
        tag = tag[..., None]
    K, H, W = det.shape
    sel = keypoints[:, 2] > 0
    if not np.any(sel):
        return keypoints
    pts = keypoints[sel][:, :2].astype(np.int32)
    tags = tag[np.nonzero(sel)[0], pts[:, 1], pts[:, 0]]
    prev_tag = tags.mean(axis=0)

    tt = np.sqrt(((tag - prev_tag[None, None, None]) ** 2).sum(axis=3))
    tmp2 = (det - np.round(tt)).reshape(K, -1)
    pos = tmp2.argmax(axis=1)
    keypoints = keypoints.copy()
    for i in range(K):
        y, x = pos[i] // W, pos[i] % W
        val = det[i, y, x]
        xf = x + 0.5 + (0.25 if det[i, y, min(x + 1, W - 1)] > det[i, y, max(x - 1, 0)] else -0.25)
        yf = y + 0.5 + (0.25 if det[i, min(y + 1, H - 1), x] > det[i, max(y - 1, 0), x] else -0.25)
        if val > 0 and keypoints[i, 2] == 0:
            keypoints[i, 0] = xf
            keypoints[i, 1] = yf
            keypoints[i, 2] = val
    return keypoints


def parse_np(
    det: np.ndarray,
    tag: np.ndarray,
    p: GroupParams,
    adjust: bool = True,
    refine: bool = True,
) -> Tuple[np.ndarray, List[float]]:
    """Full decode for one image. det: (K,H,W); tag: (K,H,W,T).

    Returns (people (N,K,3+T), scores list)."""
    tag_k, loc_k, val_k = top_k_np(det, tag, p)
    people = match_by_tag_np(tag_k, loc_k, val_k, p)
    if adjust:
        people = adjust_np(people, det)
    scores = [float(person[:, 2].mean()) for person in people]
    if refine:
        for i in range(len(people)):
            people[i] = refine_np(det, tag, people[i])
    return people, scores

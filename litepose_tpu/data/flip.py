"""Left-right joint permutation tables for horizontal flipping.

Dataset-specific keypoint mirror indices (reference FLIP_CONFIG,
``/root/reference/lib/dataset/transforms/build.py:15-28``).  COCO order is
(nose, eyes, ears, shoulders, elbows, wrists, hips, knees, ankles) with
left/right interleaved; CrowdPose is (shoulders, elbows, wrists, hips,
knees, ankles, head-top, neck).
"""

from __future__ import annotations

from typing import List


def _mirror_pairs(num_joints: int, pairs) -> List[int]:
    idx = list(range(num_joints))
    for a, b in pairs:
        idx[a], idx[b] = b, a
    return idx


# COCO: 17 joints; pairs are (left, right) of eye/ear/shoulder/elbow/
# wrist/hip/knee/ankle; nose (0) is its own mirror.
COCO_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16)]
# CrowdPose: 14 joints; pairs for shoulder/elbow/wrist/hip/knee/ankle;
# head-top (12) and neck (13) are self-mirrors.
CROWDPOSE_PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]

FLIP_CONFIG = {
    "COCO": _mirror_pairs(17, COCO_PAIRS),
    "COCO_WITH_CENTER": _mirror_pairs(18, COCO_PAIRS),
    "CROWDPOSE": _mirror_pairs(14, CROWDPOSE_PAIRS),
    "CROWDPOSE_WITH_CENTER": _mirror_pairs(15, CROWDPOSE_PAIRS),
}


def flip_index_for(dataset: str, with_center: bool = False) -> List[int]:
    """Resolve the flip permutation from a dataset name (reference
    inference.py:109-116 name sniffing)."""
    if "coco" in dataset:
        name = "COCO"
    elif "crowd_pose" in dataset or "crowdpose" in dataset:
        name = "CROWDPOSE"
    else:
        raise ValueError(f"no flip_index known for dataset {dataset!r}")
    return FLIP_CONFIG[name + "_WITH_CENTER"] if with_center else FLIP_CONFIG[name]

"""Visualization: skeleton rendering, heatmap/tagmap grids, debug dumps.

Capability parity with the reference visualization toolkit
(``/root/reference/lib/utils/vis.py`` and
``nano_demo/utils/vis.py:109`` ``get_annotated_image``), reimplemented over
our NHWC arrays and dataset metadata.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..data import VIS_CONFIG


def _colors(n: int):
    rng = np.random.default_rng(1234)
    return [tuple(int(c) for c in rng.integers(60, 255, 3)) for _ in range(n)]


def draw_skeleton(
    image_rgb: np.ndarray,
    people: Sequence[np.ndarray],
    dataset: str = "CROWDPOSE",
    score_threshold: float = 0.1,
    radius: int = 3,
    thickness: int = 2,
) -> np.ndarray:
    """Render detected people onto a copy of the image.

    people: iterable of (K, >=3) arrays in image coordinates.
    """
    import cv2

    canvas = np.ascontiguousarray(image_rgb.copy())
    skeleton = VIS_CONFIG[dataset]["vis_skeleton"]
    palette = _colors(max(len(people), 1))
    for pid, person in enumerate(people):
        color = palette[pid % len(palette)]
        pts = np.asarray(person)
        for a, b in skeleton:
            if a < len(pts) and b < len(pts) and pts[a, 2] > score_threshold and pts[b, 2] > score_threshold:
                pa = (int(pts[a, 0]), int(pts[a, 1]))
                pb = (int(pts[b, 0]), int(pts[b, 1]))
                cv2.line(canvas, pa, pb, color, thickness)
        for j in range(len(pts)):
            if pts[j, 2] > score_threshold:
                cv2.circle(canvas, (int(pts[j, 0]), int(pts[j, 1])), radius, color, -1)
    return canvas


def save_valid_image(image_rgb, people, path: str, dataset: str = "CROWDPOSE"):
    import cv2

    canvas = draw_skeleton(image_rgb, people, dataset)
    cv2.imwrite(path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return canvas


def make_heatmaps_grid(image_rgb: np.ndarray, heatmaps: np.ndarray) -> np.ndarray:
    """Side-by-side grid of the image blended with each joint heatmap.

    heatmaps: (K, H, W) in [0, 1]-ish.
    """
    import cv2

    K, h, w = heatmaps.shape
    image = cv2.resize(image_rgb, (w, h))
    panels = [image]
    for k in range(K):
        hm = np.clip(heatmaps[k], 0, 1)
        hm8 = (hm * 255).astype(np.uint8)
        colored = cv2.applyColorMap(hm8, cv2.COLORMAP_JET)
        colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
        blend = (image * 0.3 + colored * 0.7).astype(np.uint8)
        panels.append(blend)
    return np.concatenate(panels, axis=1)


def make_tagmaps_grid(image_rgb: np.ndarray, tagmaps: np.ndarray) -> np.ndarray:
    """Grid of normalized tag maps. tagmaps: (K, H, W[, T])."""
    if tagmaps.ndim == 4:
        tagmaps = tagmaps[..., 0]
    lo, hi = float(tagmaps.min()), float(tagmaps.max())
    norm = (tagmaps - lo) / max(hi - lo, 1e-6)
    return make_heatmaps_grid(image_rgb, norm)


def save_debug_images(
    image_rgb: np.ndarray,
    prefix: str,
    heatmaps_gt: Optional[np.ndarray] = None,
    heatmaps_pred: Optional[np.ndarray] = None,
    tagmaps_pred: Optional[np.ndarray] = None,
):
    """Dump the debug grids the reference writes during training
    (``lib/utils/vis.py:209-238``)."""
    import cv2

    def w(name, grid):
        cv2.imwrite(f"{prefix}_{name}.jpg", cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))

    if heatmaps_gt is not None:
        w("hm_gt", make_heatmaps_grid(image_rgb, heatmaps_gt))
    if heatmaps_pred is not None:
        w("hm_pred", make_heatmaps_grid(image_rgb, heatmaps_pred))
    if tagmaps_pred is not None:
        w("tag_pred", make_tagmaps_grid(image_rgb, tagmaps_pred))

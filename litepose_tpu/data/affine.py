"""Geometric transform machinery (host side, numpy + cv2).

Re-derivation of the reference affine toolkit
(``/root/reference/lib/utils/transforms.py:50-202``).  The transform is a
similarity mapping defined by a center, a scale (x200 pixels — the
person-detection convention inherited from MPII), a rotation, and an output
size; the reference builds it from three anchor-point correspondences via
``cv2.getAffineTransform``.  We solve the same 3-point system analytically
with a linear solve, which is numerically identical.

The 64-pixel-aligned multi-scale resize ladder (``get_multi_scale_size``)
must be reproduced exactly: it decides the shape buckets the TPU engine
compiles for, and sub-pixel differences would shift heatmap peaks.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _rot2d(pt, rad):
    sn, cs = np.sin(rad), np.cos(rad)
    return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], np.float32)


def _perp(d):
    return np.array([-d[1], d[0]], dtype=np.float32)


def get_affine_transform(
    center,
    scale,
    rot: float,
    output_size,
    shift=(0.0, 0.0),
    inv: bool = False,
) -> np.ndarray:
    """2x3 affine matrix mapping source image coords -> output coords.

    ``scale`` is in units of 200 px (reference ``scale_tmp = scale * 200``,
    transforms.py:69).  ``rot`` in degrees.
    """
    scale = np.asarray(scale, np.float32)
    if scale.ndim == 0:
        scale = np.array([scale, scale], np.float32)
    center = np.asarray(center, np.float32)
    shift = np.asarray(shift, np.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rad = np.pi * rot / 180.0
    src_dir = _rot2d([0.0, src_w * -0.5], rad)
    dst_dir = np.array([0.0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale_tmp * shift
    src[1] = center + src_dir + scale_tmp * shift
    src[2] = src[1] + _perp(src[0] - src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = dst[1] + _perp(dst[0] - dst[1])

    if inv:
        src, dst = dst, src
    # solve [x, y, 1] @ M.T = [x', y'] for the three correspondences
    P = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1).astype(np.float64)
    M = np.linalg.solve(P, dst.astype(np.float64))  # (3, 2)
    return M.T  # (2, 3)


def affine_transform_points(pts: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply a 2x3 affine to (N, 2) points (vectorized)."""
    pts = np.asarray(pts, np.float64)
    return pts @ mat[:, :2].T + mat[:, 2]


def warp_image(image: np.ndarray, mat: np.ndarray, output_size) -> np.ndarray:
    """Bilinear warp via cv2 (host path; exact parity with the reference's
    cv2.warpAffine preprocessing)."""
    import cv2

    return cv2.warpAffine(image, mat.astype(np.float64), (int(output_size[0]), int(output_size[1])))


def get_multi_scale_size(
    image_shape: Tuple[int, int],
    input_size: int,
    current_scale: float,
    min_scale: float,
):
    """64-aligned resize target for a test scale.

    image_shape: (h, w). Returns ((w_resized, h_resized), center, scale) —
    reference transforms.py:155-176 semantics.
    """
    h, w = image_shape[:2]
    center = np.array([int(w / 2.0 + 0.5), int(h / 2.0 + 0.5)], np.float32)
    min_input_size = int((min_scale * input_size + 63) // 64 * 64)
    if w < h:
        w_resized = int(min_input_size * current_scale / min_scale)
        h_resized = int(int((min_input_size / w * h + 63) // 64 * 64) * current_scale / min_scale)
        scale_w = w / 200.0
        scale_h = h_resized / w_resized * w / 200.0
    else:
        h_resized = int(min_input_size * current_scale / min_scale)
        w_resized = int(int((min_input_size / h * w + 63) // 64 * 64) * current_scale / min_scale)
        scale_h = h / 200.0
        scale_w = w_resized / h_resized * h / 200.0
    return (w_resized, h_resized), center, np.array([scale_w, scale_h], np.float32)


def resize_align_multi_scale(
    image: np.ndarray, input_size: int, current_scale: float, min_scale: float
):
    """Resize an image for one test scale (64-aligned). Returns
    (image_resized, center, scale)."""
    size_resized, center, scale = get_multi_scale_size(
        image.shape[:2], input_size, current_scale, min_scale
    )
    mat = get_affine_transform(center, scale, 0, size_resized)
    return warp_image(image, mat, size_resized), center, scale


def transform_preds(coords: np.ndarray, center, scale, output_size) -> np.ndarray:
    """Project predicted (x, y, ...) rows from heatmap space back to source
    image coords (reference transforms.py:50-56)."""
    out = np.array(coords, np.float64, copy=True)
    mat = get_affine_transform(center, scale, 0, output_size, inv=True)
    out[:, :2] = affine_transform_points(coords[:, :2], mat)
    return out


def get_final_preds(
    grouped_people: np.ndarray, center, scale, heatmap_size
) -> List[np.ndarray]:
    """Inverse-project each detected person's joints to original image
    coordinates (reference transforms.py:195-202).

    grouped_people: (N, K, >=3) array; heatmap_size: (w, h)."""
    return [
        transform_preds(person, center, scale, heatmap_size)
        for person in grouped_people
    ]


def resize_shortest(image: np.ndarray, input_size: int):
    """Single-scale resize with 64-aligned long edge (reference ``resize``,
    transforms.py:128-152)."""
    h, w = image.shape[:2]
    center = np.array([int(w / 2.0 + 0.5), int(h / 2.0 + 0.5)], np.float32)
    if w < h:
        w_resized = input_size
        h_resized = int((input_size / w * h + 63) // 64 * 64)
        scale_w = w / 200.0
        scale_h = h_resized / w_resized * w / 200.0
    else:
        h_resized = input_size
        w_resized = int((input_size / h * w + 63) // 64 * 64)
        scale_h = h / 200.0
        scale_w = w_resized / h_resized * h / 200.0
    scale = np.array([scale_w, scale_h], np.float32)
    mat = get_affine_transform(center, scale, 0, (w_resized, h_resized))
    return warp_image(image, mat, (w_resized, h_resized)), center, scale

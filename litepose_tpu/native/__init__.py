"""Native (C++) host decode: build + ctypes bindings.

The reference ships a C++ torch extension for deployment-time grouping
(``/root/reference/nano_demo/fast_utils/``, built by ``nano_demo/setup.py``).
This package provides the same capability without torch: a plain C shared
library built with g++ on first use and bound via ctypes.  Used as the
accelerator-free fallback of the deployment engine and as a second parity
oracle for the on-device decode.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "fast_group.cpp")
_LIB_PATH = os.path.join(_THIS_DIR, "_fast_group.so")

_lib = None


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.lp_find_peaks.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int, i32p, f32p, f32p, f32p,
    ]
    lib.lp_find_peaks.restype = None
    lib.lp_assign.argtypes = [
        i32p, f32p, f32p, f32p, i32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.lp_assign.restype = ctypes.c_int32
    _lib = lib
    return lib


class NativeHeatmapParser:
    """Host decode with the C++ kernels (find_peaks + assignment).

    Matches ``group_ref.parse_np`` semantics for the NMS window caveat: the
    C++ peak finder treats a point as a peak if no window neighbor is
    strictly greater (ties keep both, like maxpool-equality NMS).
    """

    def __init__(self, params):
        from ..ops.group_ref import GroupParams

        assert isinstance(params, GroupParams)
        self.p = params
        self.lib = load_library()

    def parse(self, det: np.ndarray, tag: np.ndarray):
        """det: (K, H, W); tag: (K, H, W, T) -> (people (N, K, 3+T), scores)."""
        p = self.p
        K, H, W = det.shape
        T = tag.shape[-1]
        M = p.max_num_people
        det = np.ascontiguousarray(det, np.float32)
        tag = np.ascontiguousarray(tag, np.float32)
        counts = np.zeros((K,), np.int32)
        vals = np.zeros((K, M), np.float32)
        xys = np.zeros((K, M, 2), np.float32)
        tags = np.zeros((K, M, T), np.float32)
        self.lib.lp_find_peaks(
            det, tag, K, H, W, T, p.detection_threshold, M, p.nms_kernel,
            counts, vals, xys, tags,
        )
        order = np.asarray(p.joint_order, np.int32)
        people = np.zeros((p.max_clusters, K, 3 + T), np.float32)
        n = self.lib.lp_assign(
            counts, vals, xys, tags, order, K, M, T, p.tag_threshold,
            int(p.use_detection_val), int(p.ignore_too_much), M,
            p.max_clusters, people,
        )
        people = people[:n]
        scores = [float(person[:, 2].mean()) for person in people]
        return people, scores

"""Read images from inside zip archives: ``path/to/archive.zip@inner/img.jpg``.

Capability parity with ``/root/reference/lib/utils/zipreader.py`` (cached
zipfile handles keyed by archive path).
"""

from __future__ import annotations

import os
import zipfile
from typing import Dict

import numpy as np

_SPLIT = "@"
_handles: Dict[str, zipfile.ZipFile] = {}


def is_zip_path(path: str) -> bool:
    return _SPLIT in path and ".zip" in path


def split_zip_path(path: str):
    archive, inner = path.split(_SPLIT, 1)
    assert archive.endswith(".zip"), f"not a zip archive: {archive}"
    return archive, inner


def read_bytes(path: str) -> bytes:
    archive, inner = split_zip_path(path)
    handle = _handles.get(archive)
    if handle is None:
        handle = zipfile.ZipFile(archive, "r")
        _handles[archive] = handle
    return handle.read(inner)


def imread(path: str, flags=None) -> np.ndarray:
    import cv2

    if flags is None:
        flags = cv2.IMREAD_COLOR
    data = np.frombuffer(read_bytes(path), np.uint8)
    return cv2.imdecode(data, flags)


def close_all():
    for h in _handles.values():
        h.close()
    _handles.clear()

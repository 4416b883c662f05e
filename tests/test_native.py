"""Native C++ decode parity vs the numpy oracle."""

import numpy as np
import pytest

from litepose_tpu.ops.group_ref import GroupParams, parse_np


@pytest.fixture(scope="module")
def parser_cls():
    from litepose_tpu.native import NativeHeatmapParser

    return NativeHeatmapParser


def _scene(seed):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_group import _synthetic_scene

    return _synthetic_scene(seed, n_people=3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_matches_numpy_oracle(parser_cls, seed):
    p = GroupParams(num_joints=14, detection_threshold=0.1, nms_kernel=5, nms_padding=2)
    det, tag = _scene(seed)
    native = parser_cls(p)
    people_c, scores_c = native.parse(det, tag)
    people_np, scores_np = parse_np(det, tag, p, adjust=False, refine=False)
    assert people_c.shape[0] == people_np.shape[0]
    np.testing.assert_allclose(people_c, people_np, atol=1e-4)
    np.testing.assert_allclose(scores_c, scores_np, atol=1e-5)


def test_native_empty(parser_cls):
    p = GroupParams(num_joints=14, detection_threshold=0.5)
    native = parser_cls(p)
    det = np.zeros((14, 32, 32), np.float32)
    tag = np.zeros((14, 32, 32, 1), np.float32)
    people, scores = native.parse(det, tag)
    assert people.shape[0] == 0 and scores == []

"""Utils (vis, zipreader, summary, logging) and graft-entry tests."""

import os
import zipfile

import numpy as np
import pytest


def test_draw_skeleton_and_grids(tmp_path):
    from litepose_tpu.utils.vis import (
        draw_skeleton,
        make_heatmaps_grid,
        make_tagmaps_grid,
        save_valid_image,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    person = np.zeros((14, 3))
    person[:, 0] = rng.uniform(10, 150, 14)
    person[:, 1] = rng.uniform(10, 110, 14)
    person[:, 2] = 0.9
    canvas = draw_skeleton(img, [person], "CROWDPOSE")
    assert canvas.shape == img.shape
    assert not np.array_equal(canvas, img)  # something was drawn

    out = save_valid_image(img, [person], str(tmp_path / "vis.jpg"))
    assert os.path.exists(tmp_path / "vis.jpg")

    hm = rng.random((3, 30, 40)).astype(np.float32)
    grid = make_heatmaps_grid(img, hm)
    assert grid.shape == (30, 40 * 4, 3)
    tg = make_tagmaps_grid(img, rng.standard_normal((3, 30, 40)).astype(np.float32))
    assert tg.shape == (30, 40 * 4, 3)


def test_zipreader(tmp_path):
    import cv2

    from litepose_tpu.utils import zipreader

    img = np.random.default_rng(0).integers(0, 255, (20, 30, 3)).astype(np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    archive = tmp_path / "images.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.writestr("sub/img.png", png)
    path = f"{archive}@sub/img.png"
    assert zipreader.is_zip_path(path)
    out = zipreader.imread(path)
    np.testing.assert_array_equal(out, img)
    zipreader.close_all()


def test_model_summary():
    import jax

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.models.litepose import ModelSpec, init_litepose
    from litepose_tpu.utils.summary import count_params, model_summary

    arch = get_arch("auto-XS")
    params, _ = init_litepose(jax.random.PRNGKey(0), ModelSpec(num_joints=14), arch)
    n = count_params(params)
    assert 1e5 < n < 1e7
    text = model_summary(params, arch, 14)
    assert "MACs" in text and "1.2" in text  # XS is 1.2 GMACs


def test_graft_entry_single_device():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    heat, tag = out
    assert heat.shape[0] == 1 and heat.shape[-1] == 14
    assert np.isfinite(np.asarray(heat)).all()


@pytest.mark.slow  # ~60s full-step compile; covered by the driver/slow suite
def test_graft_entry_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # conftest provides 8 virtual CPU devices

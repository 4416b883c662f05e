"""CLI smoke tests for the NAS/deployment tools.

The reference repo's only de-facto tests are the inline numeric self-checks
inside its root scripts (``/root/reference/weight_transfer.py:209-221``,
``/root/reference/fuse_bn.py:205-216`` — SURVEY.md section 4); these tests
drive our equivalents end-to-end so those built-in verifications execute in
CI, plus the search / calibrate / demo CLIs that the reference never
covered at all.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # each CLI jits a model on the 1-core host

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Shared tiny assets: 64-px arch JSON, supernet + subnet checkpoints,
    fixture dataset."""
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixture_data import make_fixture

    from litepose_tpu.arch.manager import ArchManager
    from litepose_tpu.models.litepose import ModelSpec, init_litepose
    from litepose_tpu.models.super_litepose import SuperDims, init_super_litepose
    from litepose_tpu.train.checkpoint import save_params

    d = tmp_path_factory.mktemp("cliassets")
    m = ArchManager(seed=0)
    arch = m.fixed_sample(reso=64, ratio=0.25)
    arch_json = str(d / "arch64.json")
    with open(arch_json, "w") as f:
        json.dump(arch.to_dict(), f)

    spec = ModelSpec(num_joints=14)
    sp, ss = init_super_litepose(
        jax.random.PRNGKey(0), spec, SuperDims.from_manager(m)
    )
    super_ckpt = str(d / "supernet.msgpack")
    save_params(super_ckpt, sp, ss)

    p, s = init_litepose(jax.random.PRNGKey(1), spec, arch)
    sub_ckpt = str(d / "subnet.msgpack")
    save_params(sub_ckpt, p, s)

    ann, img_dir = make_fixture(str(d / "fix"), num_joints=14, n_images=4)
    return {
        "dir": str(d), "arch_json": arch_json, "super_ckpt": super_ckpt,
        "sub_ckpt": sub_ckpt, "ann": ann, "img_dir": img_dir,
    }


def test_weight_transfer_cli(assets):
    # the tool itself asserts supernet-vs-subnet output MSE < 1e-6
    out = os.path.join(assets["dir"], "transferred.msgpack")
    r = _run(
        [os.path.join(REPO, "tools/weight_transfer.py"),
         "--cfg", os.path.join(REPO, "configs/crowd_pose/mobilenet/supermobile.yaml"),
         "--superconfig", assets["arch_json"],
         "--ckpt", assets["super_ckpt"], "--out", out],
        cwd=assets["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MSE supernet-vs-subnet" in r.stdout
    assert os.path.exists(out)


def test_fuse_bn_cli(assets):
    # the tool itself asserts fused-vs-raw max diff < 1e-3
    out = os.path.join(assets["dir"], "fused.msgpack")
    r = _run(
        [os.path.join(REPO, "tools/fuse_bn.py"),
         "--cfg", os.path.join(REPO, "configs/crowd_pose/mobilenet/mobile.yaml"),
         "--superconfig", assets["arch_json"],
         "--ckpt", assets["sub_ckpt"], "--out", out],
        cwd=assets["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fused-vs-raw" in r.stdout
    assert os.path.exists(out)


def test_calibrate_test_cli(assets):
    r = _run(
        [os.path.join(REPO, "tools/calibrate_test.py"),
         "--cfg", os.path.join(REPO, "configs/crowd_pose/mobilenet/supermobile.yaml"),
         "--ckpt", assets["super_ckpt"], "--superconfig", assets["arch_json"],
         "--ann-file", assets["ann"], "--image-dir", assets["img_dir"],
         "--max-eval-images", "2", "TEST.FLIP_TEST", "False"],
        cwd=assets["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "calibrated AP" in r.stdout


def test_search_cli(assets):
    out = os.path.join(assets["dir"], "search_result.json")
    r = _run(
        [os.path.join(REPO, "tools/search.py"),
         "--cfg", os.path.join(REPO, "configs/crowd_pose/mobilenet/supermobile.yaml"),
         "--ckpt", assets["super_ckpt"], "--constraint", "2.0",
         "--ann-file", assets["ann"], "--image-dir", assets["img_dir"],
         "--out", out, "--population", "2", "--iterations", "1",
         "--max-eval-images", "1", "TEST.FLIP_TEST", "False"],
        cwd=assets["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.load(open(out))
    # schema must match the reference's search_result.json byte layout:
    # {"0": [constraint, [acc, arch_dict, eff]]}
    # (/root/reference/search.py:134-139)
    ref_path = "/root/reference/arch_search/result/search_result.json"
    if os.path.exists(ref_path):
        ref = json.load(open(ref_path))
        ref_entry, got_entry = ref["0"], d["0"]
        assert isinstance(got_entry, list) and len(got_entry) == 2
        acc_arch_eff = got_entry[1]
        assert len(acc_arch_eff) == 3
        assert sorted(acc_arch_eff[1].keys()) == sorted(ref_entry[1][1].keys())
    else:
        got_entry = d["0"]
        acc_arch_eff = got_entry[1]
    assert isinstance(acc_arch_eff[0], float)  # acc
    assert "img_size" in acc_arch_eff[1]  # arch
    assert isinstance(acc_arch_eff[2], float)  # eff (GMACs)
    assert os.path.exists(out + ".history.json")


def test_demo_cli(assets):
    out_dir = os.path.join(assets["dir"], "demo_out")
    r = _run(
        [os.path.join(REPO, "tools/demo.py"),
         "--arch", assets["arch_json"], "--input", assets["img_dir"],
         "--output", out_dir, "--input-size", "64", "--backend", "native"],
        cwd=assets["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rendered = [f for f in os.listdir(out_dir) if f.endswith(".jpg")]
    assert len(rendered) == 4


def test_export_cli(assets):
    out = os.path.join(assets["dir"], "artifact.stablehlo")
    r = _run(
        [os.path.join(REPO, "tools/export.py"),
         "--arch", assets["arch_json"], "--weights", assets["sub_ckpt"],
         "--batch", "2", "--platform", "cpu", "--out", out],
        cwd=assets["dir"],
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert "wrote" in r.stdout and "batch=2" in r.stdout

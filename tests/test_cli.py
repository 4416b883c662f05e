"""CLI smoke tests: train -> valid round trip on the fixture dataset."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# 2400s: the train CLI alone takes ~740s on a 1-core host with a cold
# compile cache; 1200 left no headroom for any co-running load
def _run(args, cwd, timeout=2400):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_train_then_valid_cli(tmp_path):
    from fixture_data import make_fixture

    ann, img_dir = make_fixture(str(tmp_path / "fix"), num_joints=14, n_images=4)
    out_dir = str(tmp_path / "out")
    common = [
        "--ann-file", ann, "--image-dir", img_dir,
        "DATASET.INPUT_SIZE", "128", "DATASET.OUTPUT_SIZE", "[32, 64]",
        "OUTPUT_DIR", out_dir, "LOG_DIR", str(tmp_path / "log"),
    ]
    r = _run(
        [os.path.join(REPO, "tools/train.py"), "--cfg",
         os.path.join(REPO, "configs/crowd_pose/mobilenet/mobile.yaml")]
        + common + ["TRAIN.END_EPOCH", "1", "TRAIN.IMAGES_PER_GPU", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(out_dir, "crowd_pose_kpt/pose_mobilenet/mobile/final_state.msgpack")
    assert os.path.exists(ckpt)

    r = _run(
        [os.path.join(REPO, "tools/valid.py"), "--cfg",
         os.path.join(REPO, "configs/crowd_pose/mobilenet/mobile.yaml")]
        + common + ["TEST.FLIP_TEST", "False", "TEST.MODEL_FILE", ckpt,
                    "--max-images", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # results json written
    res = os.path.join(out_dir, "crowd_pose_kpt/pose_mobilenet/mobile/keypoint_results.json")
    assert os.path.exists(res)


@pytest.mark.slow
def test_make_bench_ckpt_cli(tmp_path):
    """tools/make_bench_ckpt.py produces a loadable checkpoint (tiny run)."""
    out = str(tmp_path / "ckpt.msgpack")
    r = _run(
        [os.path.join(REPO, "tools/make_bench_ckpt.py"),
         "--arch", "auto-XS", "--steps", "2", "--batch", "2",
         "--images", "4", "--out", out],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)

    import jax

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.models.litepose import ModelSpec, init_litepose
    from litepose_tpu.train.checkpoint import load_params

    arch = get_arch("auto-XS")
    params, state = init_litepose(jax.random.PRNGKey(0), ModelSpec(num_joints=14), arch)
    load_params(out, params, state)  # raises on any pytree/shape mismatch


@pytest.mark.slow
def test_profile_model_cli(tmp_path):
    """tools/profile_model.py runs its forward section on CPU (serve is
    skipped: the Pallas decode kernels interpret-run in minutes off-TPU)."""
    r = _run(
        [os.path.join(REPO, "tools/profile_model.py"),
         "--arch", "auto-XS", "--batch", "2", "--forward-only"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "forward (eval, bf16)" in r.stdout

"""CLI smoke tests: train -> valid round trip on the fixture dataset."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity/CLI suite; deselect via -m 'not slow'

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd, timeout=560):
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

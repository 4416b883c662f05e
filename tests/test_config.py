"""Config system tests incl. reference-YAML compatibility."""

import pytest

from litepose_tpu.config import check_config, default_config, update_config


REF_YAMLS = [
    "/root/reference/experiments/crowd_pose/mobilenet/mobile.yaml",
    "/root/reference/experiments/crowd_pose/mobilenet/supermobile.yaml",
    "/root/reference/experiments/coco/mobilenet/mobile.yaml",
    "/root/reference/experiments/crowd_pose/higher_hrnet/w32_512_adam_lr1e-3.yaml",
    "/root/reference/experiments/crowd_pose/efficient_hrnet/H-1.yaml",
    "/root/reference/experiments/crowd_pose/resnet/resnet.yaml",
]


@pytest.mark.parametrize("path", REF_YAMLS)
def test_reference_experiment_yaml_parses(path):
    import os

    if not os.path.exists(path):
        pytest.skip("reference yaml not present")
    cfg = default_config()
    update_config(cfg, path)
    check_config(cfg)
    assert cfg.MODEL.NAME
    assert cfg.DATASET.NUM_JOINTS in (14, 17, 15, 18)
    assert len(cfg.LOSS.WITH_AE_LOSS) == cfg.LOSS.NUM_STAGES


def test_cli_opts_override():
    cfg = default_config()
    update_config(cfg, None, ["TRAIN.LR", "0.01", "MODEL.NAME", "pose_simplenet",
                              "DATASET.OUTPUT_SIZE", "[32, 64]"])
    assert cfg.TRAIN.LR == 0.01
    assert cfg.MODEL.NAME == "pose_simplenet"
    assert list(cfg.DATASET.OUTPUT_SIZE) == [32, 64]


def test_factor_tuple_strings_parse_as_floats(tmp_path):
    """Reference-style tuple-string YAML values for the float FACTOR keys
    must parse as floats, not booleans (which would zero the loss)."""
    import yaml

    p = tmp_path / "f.yaml"
    p.write_text(
        "LOSS:\n"
        "  NUM_STAGES: 2\n"
        "  HEATMAPS_LOSS_FACTOR: (1.0, 1.0)\n"
        "  PUSH_LOSS_FACTOR: (0.001, 0.001)\n"
        "  PULL_LOSS_FACTOR: (0.001, 0.001)\n"
        "  WITH_HEATMAPS_LOSS: (True, True)\n"
        "  WITH_AE_LOSS: (True, False)\n"
    )
    cfg = default_config()
    update_config(cfg, str(p))
    assert cfg.LOSS.HEATMAPS_LOSS_FACTOR == (1.0, 1.0)
    assert cfg.LOSS.PUSH_LOSS_FACTOR == (0.001, 0.001)
    assert cfg.LOSS.PULL_LOSS_FACTOR == (0.001, 0.001)
    assert cfg.LOSS.WITH_HEATMAPS_LOSS == (True, True)
    assert cfg.LOSS.WITH_AE_LOSS == (True, False)


def test_freeze_blocks_mutation():
    cfg = default_config()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 5.0
    cfg.defrost()
    cfg.TRAIN.LR = 5.0


def test_with_center_joint_bump(tmp_path):
    import yaml

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({"DATASET": {"WITH_CENTER": True, "NUM_JOINTS": 17}}))
    cfg = default_config()
    update_config(cfg, str(p))
    assert cfg.DATASET.NUM_JOINTS == 18
    assert cfg.MODEL.NUM_JOINTS == 18

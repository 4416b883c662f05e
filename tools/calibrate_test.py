#!/usr/bin/env python
"""Calibrated sub-network evaluation (the reference ``calibrate_test.py``).

Extracts an architecture from a supernet checkpoint, recalibrates its
BatchNorm statistics on a calibration split, and reports mAP on an eval
split — the NAS accuracy measurement in isolation.

  python tools/calibrate_test.py --cfg configs/crowd_pose/mobilenet/supermobile.yaml \
      --ckpt supernet.msgpack --superconfig mobile_configs/search-S.json \
      --ann-file ... --image-dir ...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", required=True, help="supernet checkpoint (.msgpack)")
    p.add_argument("--superconfig", required=True, help="arch JSON to evaluate")
    p.add_argument("--ann-file", required=True)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--max-eval-images", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from litepose_tpu.arch import ArchManager, load_arch
    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.data.dataset import PoseDataset
    from litepose_tpu.models.litepose import ModelSpec
    from litepose_tpu.models.super_litepose import SuperDims, init_super_litepose
    from litepose_tpu.nas.predictors import AccuracyPredictor
    from litepose_tpu.train.checkpoint import load_params

    cfg = default_config()
    update_config(cfg, args.cfg, args.opts)
    arch = load_arch(args.superconfig)
    spec = ModelSpec.from_config(cfg)
    manager = ArchManager(deconv_setting=cfg.MODEL.EXTRA.NUM_DECONV_FILTERS)
    dims = SuperDims.from_manager(manager)
    sp, ss = init_super_litepose(jax.random.PRNGKey(0), spec, dims)
    sp, ss = load_params(args.ckpt, sp, ss)

    style = "coco" if "coco" in cfg.DATASET.DATASET else "crowdpose"
    calib = PoseDataset(args.ann_file, args.image_dir, cfg.DATASET.NUM_JOINTS, style=style)
    search = PoseDataset(args.ann_file, args.image_dir, cfg.DATASET.NUM_JOINTS,
                         style=style, filter_for_train=False)
    acc = AccuracyPredictor(
        sp, ss, dims, spec, calib, search, cfg, max_eval_images=args.max_eval_images
    )
    ap = acc(arch)
    print(f"calibrated AP for {args.superconfig}: {ap:.4f}")
    return ap


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Evolutionary NAS CLI (the reference ``search.py`` flow).

  python tools/search.py --cfg configs/crowd_pose/mobilenet/supermobile.yaml \
      --ckpt output/.../checkpoint.msgpack --constraint 8.0 \
      --ann-file ... --image-dir ... --out search_result.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", required=True, help="supernet checkpoint (.msgpack)")
    p.add_argument("--constraint", type=float, default=8.0, help="GMACs budget")
    p.add_argument("--ann-file", required=True, help="annotations for calib+search split")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--out", default="search_result.json")
    p.add_argument("--population", type=int, default=40)
    p.add_argument("--iterations", type=int, default=40)
    p.add_argument("--max-eval-images", type=int, default=200)
    p.add_argument("--scoring", choices=("extract", "masked"), default="extract",
                   help="masked: score candidates through the masked-at-max-"
                        "width supernet forward — the mask descriptor is a "
                        "traced argument, so all candidates of a resolution "
                        "share one compiled program (no per-candidate XLA "
                        "compile; the TPU-scale search mode)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from litepose_tpu.arch import ArchManager
    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.data.dataset import PoseDataset
    from litepose_tpu.models.litepose import ModelSpec
    from litepose_tpu.models.super_litepose import SuperDims, init_super_litepose
    from litepose_tpu.nas import AccuracyPredictor, EfficiencyPredictor, EvolutionFinder
    from litepose_tpu.train.checkpoint import load_params
    from litepose_tpu.utils.logging import setup_logger

    cfg = default_config()
    update_config(cfg, args.cfg, args.opts)
    logger = setup_logger("output/search", phase="search")

    spec = ModelSpec.from_config(cfg)
    manager = ArchManager(deconv_setting=cfg.MODEL.EXTRA.NUM_DECONV_FILTERS, seed=cfg.SEED)
    dims = SuperDims.from_manager(manager)
    sp, ss = init_super_litepose(jax.random.PRNGKey(0), spec, dims)
    sp, ss = load_params(args.ckpt, sp, ss)

    style = "coco" if "coco" in cfg.DATASET.DATASET else "crowdpose"
    calib = PoseDataset(args.ann_file, args.image_dir, cfg.DATASET.NUM_JOINTS, style=style)
    search = PoseDataset(args.ann_file, args.image_dir, cfg.DATASET.NUM_JOINTS,
                         style=style, filter_for_train=False)

    eff = EfficiencyPredictor(num_joints=cfg.DATASET.NUM_JOINTS)
    acc = AccuracyPredictor(
        sp, ss, dims, spec, calib, search, cfg,
        max_eval_images=args.max_eval_images, scoring=args.scoring,
    )
    finder = EvolutionFinder(
        eff, acc, manager,
        population_size=args.population, max_time_budget=args.iterations,
        seed=cfg.SEED,
    )
    import time

    t0 = time.time()
    best_acc, best_arch, history = finder.run_evolution_search(
        args.constraint, logger=logger
    )
    wall = time.time() - t0
    best_eff = eff(best_arch)
    logger.info(
        f"best AP {best_acc:.4f} at {best_eff:.2f} GMACs "
        f"({wall:.0f}s wall, {len(acc.cache)} unique candidates scored, "
        f"scoring={args.scoring})"
    )
    # Reference-compatible result schema: {"0": [constraint, [acc, arch,
    # eff]]} (/root/reference/search.py:134-139 writes
    # dict[0] = (efficiency_constraint, (best_acc, best_arch, best_eff))).
    # Any consumer of the reference's search_result.json reads ours
    # unchanged; the per-iteration history goes to a sidecar file.
    with open(args.out, "w") as f:
        json.dump(
            {0: (args.constraint, (best_acc, best_arch.to_dict(), best_eff))}, f
        )
    with open(args.out + ".history.json", "w") as f:
        json.dump(history, f)
    logger.info(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Evaluation CLI (the reference ``valid.py`` flow, decode fused on device).

  python tools/valid.py --cfg configs/crowd_pose/mobilenet/mobile.yaml \
      --superconfig mobile_configs/search-S.json \
      TEST.MODEL_FILE path/to/ckpt.pth.tar
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a pose model on TPU")
    p.add_argument("--cfg", required=True)
    p.add_argument("--superconfig", default=None)
    p.add_argument("--ann-file", default=None)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--max-images", type=int, default=0, help="0 = all")
    p.add_argument(
        "--batch-size", type=int, default=16,
        help="images per fused eval program (grouped by resize-ladder shape "
             "bucket; 1 = the reference's per-image loop)",
    )
    p.add_argument(
        "--devices", type=int, default=1,
        help="data-parallel eval over the first N local devices "
             "(batched path only; batches shard across the mesh)",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def build_engine(cfg, arch, params, state, n_devices=1):
    from litepose_tpu.core.engine import EngineConfig, PoseEngine
    from litepose_tpu.core.inference import InferenceFlags
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models import get_model
    from litepose_tpu.ops.group_ref import GroupParams
    from litepose_tpu.parallel.mesh import make_mesh

    _, apply_fn = get_model(
        "pose_mobilenet" if "super" in cfg.MODEL.NAME else cfg.MODEL.NAME, cfg, arch
    )

    def eval_apply(p, s, x):
        outs, _ = apply_fn(p, s, x, train=False)
        return outs

    flags = InferenceFlags.from_config(
        cfg, flip_index_for(cfg.DATASET.DATASET, cfg.DATASET.WITH_CENTER)
    )
    group = GroupParams.from_config(cfg)
    engine_cfg = EngineConfig(
        input_size=cfg.DATASET.INPUT_SIZE,
        scale_factors=tuple(cfg.TEST.SCALE_FACTOR),
        with_adjust=cfg.TEST.ADJUST,
        with_refine=cfg.TEST.REFINE,
        project2image=cfg.TEST.PROJECT2IMAGE,
    )
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    return PoseEngine(eval_apply, params, state, flags, group, engine_cfg,
                      mesh=mesh)


def main():
    args = parse_args()
    import jax
    import numpy as np

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from litepose_tpu.arch import ArchManager, load_arch
    from litepose_tpu.config import check_config, default_config, update_config
    from litepose_tpu.data.dataset import PoseDataset
    from litepose_tpu.models import get_model
    from litepose_tpu.models.litepose import ModelSpec
    from litepose_tpu.utils.logging import create_run_dirs, print_name_value, setup_logger

    cfg = default_config()
    update_config(cfg, args.cfg, args.opts)
    check_config(cfg)

    out_dir, _ = create_run_dirs(cfg, args.cfg, phase="valid")
    logger = setup_logger(out_dir, phase="valid")

    if args.superconfig:
        arch = load_arch(args.superconfig)
        # arch JSON overrides resolution (reference valid.py:104-111)
        cfg.defrost()
        cfg.DATASET.INPUT_SIZE = arch.img_size
        cfg.DATASET.OUTPUT_SIZE = [arch.img_size // 4, arch.img_size // 2]
        cfg.freeze()
    else:
        arch = ArchManager(
            deconv_setting=cfg.MODEL.EXTRA.NUM_DECONV_FILTERS
        ).fixed_sample(reso=cfg.DATASET.INPUT_SIZE, ratio=1.0)

    model_name = "pose_mobilenet" if "super" in cfg.MODEL.NAME else cfg.MODEL.NAME
    init_fn, _ = get_model(model_name, cfg, arch)
    params, state = init_fn(jax.random.PRNGKey(0))

    model_file = cfg.TEST.MODEL_FILE
    if model_file:
        if model_file.endswith((".pth", ".tar")):
            from litepose_tpu.models.torch_convert import load_torch_checkpoint

            sd = load_torch_checkpoint(model_file)
            if cfg.MODEL.NAME == "pose_higher_hrnet":
                from litepose_tpu.models.higher_hrnet import HRNetSpec
                from litepose_tpu.models.torch_convert import hrnet_from_torch

                params, state = hrnet_from_torch(sd, HRNetSpec.from_config(cfg))
            elif cfg.MODEL.NAME == "pose_efficient_hrnet":
                from litepose_tpu.models.efficient_hrnet import EffHRNetSpec
                from litepose_tpu.models.torch_convert import (
                    efficient_hrnet_from_torch,
                )

                params, state = efficient_hrnet_from_torch(
                    sd, EffHRNetSpec.from_config(cfg)
                )
            else:
                from litepose_tpu.models.torch_convert import litepose_from_torch

                spec = ModelSpec.from_config(cfg)
                params, state = litepose_from_torch(
                    sd, spec, arch,
                    with_skips=(cfg.MODEL.NAME != "pose_simplenet"),
                )
        else:
            from litepose_tpu.train.checkpoint import load_params

            params, state = load_params(model_file, params, state)
        logger.info(f"loaded weights from {model_file}")

    single_scale = tuple(float(s) for s in cfg.TEST.SCALE_FACTOR) == (1.0,)
    if args.devices > 1 and (args.batch_size <= 1 or not single_scale):
        # the mesh only shards the batched single-scale path; anything else
        # would silently replicate params and run single-device
        logger.warning(
            "--devices ignored: data-parallel eval needs --batch-size > 1 "
            "and single-scale TEST.SCALE_FACTOR [1]"
        )
        args.devices = 1
    engine = build_engine(cfg, arch, params, state, n_devices=args.devices)

    style = "coco" if "coco" in cfg.DATASET.DATASET else "crowdpose"
    split = cfg.DATASET.TEST
    root = cfg.DATASET.ROOT
    if style == "crowdpose":
        ann = args.ann_file or os.path.join(root, "json", f"crowdpose_{split}.json")
        img_dir = args.image_dir or os.path.join(root, "images")
    else:
        ann = args.ann_file or os.path.join(root, "annotations", f"person_keypoints_{split}.json")
        img_dir = args.image_dir or os.path.join(root, "images", split)
    ds = PoseDataset(ann, img_dir, cfg.DATASET.NUM_JOINTS, style=style,
                     with_center=cfg.DATASET.WITH_CENTER, filter_for_train=False)

    all_preds, all_scores = [], []
    n = len(ds) if args.max_images == 0 else min(args.max_images, len(ds))
    t0 = time.time()
    if args.batch_size > 1:
        # batched eval: the whole split bucketed by resize-ladder shape from
        # annotation metadata (no pixel IO), images loaded lazily per batch;
        # result-identical to the per-image loop (PoseEngine.process_indexed)
        last_logged = [0]

        def _progress(done):
            if done - last_logged[0] >= max(cfg.PRINT_FREQ, 1) or done == n:
                last_logged[0] = done
                logger.info(
                    f"eval {done}/{n} ({done / (time.time() - t0):.2f} img/s)"
                )

        for people, scores in engine.process_indexed(
            [ds.image_size(i) for i in range(n)],
            lambda i: ds.load_raw(i)[0],
            batch_size=args.batch_size, progress_cb=_progress,
        ):
            all_preds.append(people)
            all_scores.append(scores)
    else:
        for i in range(n):
            image, _, _ = ds.load_raw(i)
            people, scores = engine.process(image)
            all_preds.append(people)
            all_scores.append(scores)
            if i % cfg.PRINT_FREQ == 0:
                logger.info(f"eval {i}/{n} ({(i + 1) / (time.time() - t0):.2f} img/s)")
    ds.ids = ds.ids[:n]
    stats = ds.evaluate(all_preds, all_scores, output_dir=out_dir)
    print_name_value(logger, stats, cfg.MODEL.NAME)
    return stats


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Produce a small overfit checkpoint for bench.py's trained-weights mode.

Trains LitePose-Auto-S@448 on a synthetic stick-figure dataset
(litepose_tpu.data.synthetic) until heatmaps are peaked where people are,
then saves weights to ``assets/bench_ckpt.msgpack``.  bench.py then measures
the decode under realistic trained peak statistics at the protocol
detection threshold 0.1 (matching the reference eval,
``/root/reference/experiments/crowd_pose/mobilenet/mobile.yaml:62``) instead
of calibrating an artificial threshold against random-init noise.

Usage:  python tools/make_bench_ckpt.py [--steps 8000] [--batch 16]
        (defaults reproduce the committed assets/bench_ckpt.msgpack;
        ~15 min on one v5e chip)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="auto-S")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--images", type=int, default=160,
                    help="fixture set size; generalization to the unseen "
                         "bench scenes needs >=~100 (32 overfits: peaks "
                         "~0.43 instead of ~0.9 on unseen scenes)")
    ap.add_argument("--out", default=os.path.join(REPO, "assets", "bench_ckpt.msgpack"))
    args = ap.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.config import default_config
    from litepose_tpu.core.losses import LossConfig
    from litepose_tpu.data.dataset import PoseDataset, TrainPipeline, make_batch_iterator
    from litepose_tpu.data.synthetic import make_fixture
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.train import optim
    from litepose_tpu.train.checkpoint import init_train_state, save_params
    from litepose_tpu.train.trainer import StepFns

    arch = get_arch(args.arch)  # auto-S: 448x448
    spec = ModelSpec(num_joints=14)

    cfg = default_config()
    cfg.DATASET.INPUT_SIZE = arch.img_size
    cfg.DATASET.OUTPUT_SIZE = [arch.img_size // 4, arch.img_size // 2]
    cfg.DATASET.DATASET = "crowd_pose_kpt"
    cfg.DATASET.NUM_JOINTS = 14
    cfg.DATASET.MAX_ROTATION = 10
    cfg.DATASET.MIN_SCALE = 0.9
    cfg.DATASET.MAX_SCALE = 1.1

    with tempfile.TemporaryDirectory() as tmp:
        ann, img_dir = make_fixture(
            tmp, num_joints=14, n_images=args.images, h=512, w=512, seed=11,
            with_edge_cases=False,
            # match bench_scene_batch statistics (scaled 512/448): the bench
            # scenes must be in-distribution for this checkpoint
            n_people_range=(2, 6), size_range=(30, 100),
        )
        ds = PoseDataset(ann, img_dir, 14, style="crowdpose")
        pipe = TrainPipeline(ds, cfg, seed=0)

        # overfitting needs no fresh augmentation per step: cache a few
        # epochs of host batches once (the 1-core host would otherwise
        # bottleneck the 448^2 augmentation path)
        cached = []
        for epoch in range(4):
            for b in make_batch_iterator(pipe, args.batch, epoch, num_workers=4):
                cached.append(jax.device_put(b))
        print(f"cached {len(cached)} host batches", flush=True)

    # lr 1e-3 with a single 10x decay at 70% of the run (sharp heatmap peaks
    # + separated AE tags need the low-lr tail; a constant 1e-3 plateaus at
    # diffuse ~0.3-high bumps that saturate the decoder)
    tx = optim.make_optimizer(
        "adam", optim.multistep_lr(1e-3, [max(1, int(args.steps * 0.7))], 0.1, 100))
    loss_cfg = LossConfig(num_joints=14)

    def apply_fn(p, s, x):
        return apply_litepose(p, s, x, spec, arch, train=True)

    sfns = StepFns(apply_fn, loss_cfg, tx, base_input_size=arch.img_size,
                   base_output_sizes=list(cfg.DATASET.OUTPUT_SIZE))
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    ts = init_train_state(params, state, tx.init(params))

    fn = sfns.get()
    t0 = time.time()
    for i in range(args.steps):
        ts, metrics = fn(ts, cached[i % len(cached)])
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(metrics['total']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, ts.params, ts.model_state)
    print(f"saved {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()

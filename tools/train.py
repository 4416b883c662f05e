#!/usr/bin/env python
"""Training CLI.

TPU-native replacement for the reference ``dist_train.py``: no process
spawning, no NCCL process groups — one SPMD jit over a ``Mesh('data')``
(multi-host via ``jax.distributed.initialize``).  Usage:

  python tools/train.py --cfg configs/crowd_pose/mobilenet/mobile.yaml \
      [--superconfig mobile_configs/search-S.json] [--teacher ...] \
      [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description="Train a LitePose-family model on TPU")
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("--superconfig", default=None, help="arch JSON (subnet shape)")
    p.add_argument("--teacher", action="store_true", help="enable distillation")
    p.add_argument("--teacher-arch", default=None, help="teacher arch JSON")
    p.add_argument("--teacher-ckpt", default=None, help="teacher checkpoint (.msgpack or .pth)")
    p.add_argument("--ann-file", default=None, help="override annotation JSON path")
    p.add_argument("--image-dir", default=None, help="override image directory")
    p.add_argument("--multi-host", action="store_true", help="call jax.distributed.initialize()")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (default: cluster auto-detect)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--save-freq", type=int, default=1, help="checkpoint every N epochs")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first steps of each epoch")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.multi_host:
        import jax

        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            # TPU pod / SLURM / k8s: everything auto-detected
            jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from litepose_tpu.arch import ArchManager, load_arch
    from litepose_tpu.config import check_config, default_config, update_config
    from litepose_tpu.core.losses import LossConfig
    from litepose_tpu.data.dataset import PoseDataset, TrainPipeline, make_batch_iterator
    from litepose_tpu.models import get_model
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose
    from litepose_tpu.parallel import (
        global_batch, make_mesh, replicate_global, replicate_spec, shard_batch_spec,
    )
    from litepose_tpu.train import optim
    from litepose_tpu.train.checkpoint import auto_resume, init_train_state, save_checkpoint
    from litepose_tpu.train.trainer import StepFns, train_epoch
    from litepose_tpu.utils.logging import create_run_dirs, make_tb_writer, setup_logger

    cfg = default_config()
    update_config(cfg, args.cfg, args.opts)
    check_config(cfg)

    out_dir, tb_dir = create_run_dirs(cfg, args.cfg)
    logger = setup_logger(out_dir, rank=jax.process_index())
    writer = make_tb_writer(tb_dir) if jax.process_index() == 0 else None
    logger.info(f"devices: {jax.devices()}")

    # architecture
    arch_manager = ArchManager(
        deconv_setting=cfg.MODEL.EXTRA.NUM_DECONV_FILTERS, seed=cfg.SEED
    )
    is_supernet = cfg.MODEL.NAME in ("pose_supermobilenet", "pose_superresnet")
    if args.superconfig:
        arch = load_arch(args.superconfig).with_img_size(cfg.DATASET.INPUT_SIZE)
    elif is_supernet:
        arch = arch_manager.max_arch(cfg.DATASET.INPUT_SIZE)
    else:
        arch = arch_manager.fixed_sample(reso=cfg.DATASET.INPUT_SIZE, ratio=1.0)
    logger.info(f"model {cfg.MODEL.NAME}; arch: {arch.to_dict()}")

    init_fn, apply_fn = get_model(cfg.MODEL.NAME, cfg, arch)
    params, state = init_fn(jax.random.PRNGKey(cfg.SEED))

    litepose_family = cfg.MODEL.NAME in (
        "pose_mobilenet", "pose_simplenet", "pose_supermobilenet"
    )
    if (litepose_family and cfg.MODEL.INIT_WEIGHTS and cfg.MODEL.PRETRAINED
            and os.path.isfile(cfg.MODEL.PRETRAINED)):
        from litepose_tpu.models.torch_convert import load_torch_checkpoint
        from litepose_tpu.train.checkpoint import load_pretrained_backbone

        logger.info(f"loading backbone pretrain from {cfg.MODEL.PRETRAINED}")
        sd = load_torch_checkpoint(cfg.MODEL.PRETRAINED)
        spec = ModelSpec.from_config(cfg)
        params, state = load_pretrained_backbone(params, state, sd, spec, arch)

    # data
    style = "coco" if "coco" in cfg.DATASET.DATASET else "crowdpose"
    ann_file = args.ann_file or _default_ann_path(cfg, style, cfg.DATASET.TRAIN)
    image_dir = args.image_dir or _default_image_dir(cfg, style, cfg.DATASET.TRAIN)
    ds = PoseDataset(ann_file, image_dir, cfg.DATASET.NUM_JOINTS, style=style,
                     with_center=cfg.DATASET.WITH_CENTER)
    pipe = TrainPipeline(ds, cfg, seed=cfg.SEED)
    batch_size = cfg.TRAIN.IMAGES_PER_GPU * jax.local_device_count()
    steps_per_epoch = max(len(pipe) // (batch_size * jax.process_count()), 1)

    tx = optim.from_config(cfg, steps_per_epoch)
    loss_cfg = LossConfig.from_config(cfg)

    # teacher (distillation)
    teacher_fn = None
    if args.teacher and args.teacher_arch and args.teacher_ckpt:
        t_arch = load_arch(args.teacher_arch)
        t_spec = ModelSpec.from_config(cfg)
        if args.teacher_ckpt.endswith((".pth", ".tar")):
            from litepose_tpu.models.torch_convert import (
                litepose_from_torch,
                load_torch_checkpoint,
            )

            t_params, t_state = litepose_from_torch(
                load_torch_checkpoint(args.teacher_ckpt), t_spec, t_arch
            )
        else:
            from litepose_tpu.train.checkpoint import load_params

            t_init, _ = get_model("pose_mobilenet", cfg, t_arch)
            t_params, t_state = t_init(jax.random.PRNGKey(0))
            t_params, t_state = load_params(args.teacher_ckpt, t_params, t_state)

        def teacher_fn(x):
            outs, _ = apply_litepose(t_params, t_state, x, t_spec, t_arch, train=False)
            return outs

    from litepose_tpu.models.layers import Policy

    policy = Policy(compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE))

    def train_apply(p, s, x, arch_desc=None):
        if arch_desc is not None:
            return apply_fn(p, s, x, train=True, arch=arch_desc, policy=policy)
        return apply_fn(p, s, x, train=True, policy=policy)

    sfns = StepFns(
        train_apply, loss_cfg, tx,
        base_input_size=cfg.DATASET.INPUT_SIZE,
        base_output_sizes=list(cfg.DATASET.OUTPUT_SIZE),
        teacher_fn=teacher_fn,
        remat=bool(cfg.TPU.get("REMAT", False)),
    )

    mesh = make_mesh()
    rspec = replicate_spec(mesh)
    bspec = shard_batch_spec(mesh)
    # params/opt-state are host-identical (same PRNG seed on every process);
    # replicate them as global arrays over the full mesh
    ts = init_train_state(
        replicate_global(params, rspec), replicate_global(state, rspec),
        replicate_global(tx.init(params), rspec),
    )
    if cfg.AUTO_RESUME:
        ts = auto_resume(out_dir, ts)
        if int(ts.epoch):
            logger.info(f"auto-resumed from epoch {ts.epoch}")

    elastic = list(arch_manager.img_sizes) if is_supernet else None
    arch_sampler = None
    if is_supernet:
        def arch_sampler(rng):
            from litepose_tpu.models.super_litepose import arch_to_mask_desc

            return arch_to_mask_desc(arch_manager.random_sample(rng), arch_manager)

    def device_batches(it):
        # each process feeds its local rows; global_batch stitches the
        # host-sharded iterator output into one mesh-wide array
        for b in it:
            yield global_batch(b, bspec)

    start_epoch = int(ts.epoch)
    for epoch in range(start_epoch, cfg.TRAIN.END_EPOCH):
        if args.profile_dir and epoch == start_epoch + 1:
            # profile the second epoch (first is compile-dominated)
            jax.profiler.start_trace(args.profile_dir)
        it = make_batch_iterator(
            pipe, batch_size, epoch, shuffle=cfg.TRAIN.SHUFFLE,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        ts, metrics = train_epoch(
            sfns, ts, device_batches(it), epoch, logger=logger,
            print_freq=cfg.PRINT_FREQ, elastic_sizes=elastic,
            arch_sampler=arch_sampler, seed=cfg.SEED, writer=writer,
        )
        ts = ts._replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
        if args.profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {args.profile_dir}")
        if jax.process_index() == 0:
            if (epoch + 1) % args.save_freq == 0 or epoch + 1 == cfg.TRAIN.END_EPOCH:
                save_checkpoint(out_dir, ts)
            logger.info(f"epoch {epoch} done: {metrics}")

    if jax.process_index() == 0:
        from litepose_tpu.train.checkpoint import save_params

        save_params(os.path.join(out_dir, "final_state.msgpack"), ts.params, ts.model_state)
        logger.info("training complete")


def _default_ann_path(cfg, style, split):
    root = cfg.DATASET.ROOT
    if style == "crowdpose":
        return os.path.join(root, "json", f"crowdpose_{split}.json")
    return os.path.join(root, "annotations", f"person_keypoints_{split}.json")


def _default_image_dir(cfg, style, split):
    root = cfg.DATASET.ROOT
    if style == "crowdpose":
        return os.path.join(root, "images")
    return os.path.join(root, "images", split)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Supernet -> subnet weight extraction with output-MSE verification.

The reference tool (``/root/reference/weight_transfer.py``) copies leading
channel slices tensor-by-tensor; here extraction is a pure pytree transform
(``extract_subnet``) and verification compares supernet(pinned arch) vs
subnet outputs on a shared random input.

  python tools/weight_transfer.py --cfg configs/crowd_pose/mobilenet/supermobile.yaml \
      --superconfig mobile_configs/search-S.json \
      --ckpt output/.../checkpoint.msgpack --out pretrain/crowdpose-S.msgpack
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
    p.add_argument("--superconfig", required=True, help="target subnet arch JSON")
    p.add_argument("--ckpt", required=True, help="supernet checkpoint (.msgpack or .pth)")
    p.add_argument("--out", required=True, help="output subnet weights path")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    from litepose_tpu.arch import ArchManager, load_arch
    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.models.layers import Policy
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose
    from litepose_tpu.models.super_litepose import (
        SuperDims,
        apply_super_litepose,
        arch_to_mask_desc,
        extract_subnet,
        init_super_litepose,
    )
    from litepose_tpu.train.checkpoint import load_params, save_params

    cfg = default_config()
    update_config(cfg, args.cfg, args.opts)
    arch = load_arch(args.superconfig)
    spec = ModelSpec.from_config(cfg)
    manager = ArchManager(deconv_setting=cfg.MODEL.EXTRA.NUM_DECONV_FILTERS)
    dims = SuperDims.from_manager(manager)

    sp, ss = init_super_litepose(jax.random.PRNGKey(0), spec, dims)
    if args.ckpt.endswith((".pth", ".tar")):
        raise SystemExit(
            "supernet torch checkpoints need a super-layout converter; "
            "train the supernet with tools/train.py and pass its .msgpack"
        )
    sp, ss = load_params(args.ckpt, sp, ss)

    params, state = extract_subnet(sp, ss, arch, dims, spec)

    # verify: supernet with pinned arch vs extracted subnet on one input
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, arch.img_size, arch.img_size, 3)).astype(np.float32)
    desc = arch_to_mask_desc(arch, manager)
    outs_super, _ = jax.jit(
        lambda p_, s_, x_, d_: apply_super_litepose(p_, s_, x_, d_, spec, dims, policy=Policy.exact())
    )(sp, ss, x, desc)
    outs_sub, _ = jax.jit(
        lambda p_, s_, x_: apply_litepose(p_, s_, x_, spec, arch, policy=Policy.exact())
    )(params, state, x)
    for i, (a, b) in enumerate(zip(outs_super, outs_sub)):
        mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
        print(f"stage {i} output MSE supernet-vs-subnet: {mse:.3e}")
        assert mse < 1e-6, "weight transfer verification failed"

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_params(args.out, params, state)
    print(f"saved subnet weights to {args.out}")


if __name__ == "__main__":
    main()

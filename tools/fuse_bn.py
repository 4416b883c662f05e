#!/usr/bin/env python
"""Fold BatchNorm into convolutions with output verification.

  python tools/fuse_bn.py --cfg configs/crowd_pose/mobilenet/mobile.yaml \
      --superconfig mobile_configs/search-S.json \
      --ckpt weights.msgpack --out weights_fused.msgpack
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
    p.add_argument("--superconfig", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    from litepose_tpu.arch import load_arch
    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.models.fold_bn import fold_litepose_bn
    from litepose_tpu.models.layers import Policy
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.train.checkpoint import load_params, save_params

    cfg = default_config()
    update_config(cfg, args.cfg, args.opts)
    arch = load_arch(args.superconfig)
    spec = ModelSpec.from_config(cfg)

    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    if args.ckpt.endswith((".pth", ".tar")):
        from litepose_tpu.models.torch_convert import (
            litepose_from_torch,
            load_torch_checkpoint,
        )

        params, state = litepose_from_torch(load_torch_checkpoint(args.ckpt), spec, arch)
    else:
        params, state = load_params(args.ckpt, params, state)

    fp, fs = fold_litepose_bn(params, state)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, arch.img_size, arch.img_size, 3)).astype(np.float32)
    fwd = jax.jit(lambda p_, s_, x_: apply_litepose(p_, s_, x_, spec, arch, policy=Policy.exact()))
    outs_a, _ = fwd(params, state, x)
    outs_b, _ = fwd(fp, fs, x)
    for i, (a, b) in enumerate(zip(outs_a, outs_b)):
        diff = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        print(f"stage {i} fused-vs-raw max diff: {diff:.3e} | abssum {float(np.abs(np.asarray(b)).sum()):.1f}")
        assert diff < 1e-3, "BN fold verification failed"

    save_params(args.out, fp, fs)
    print(f"saved fused weights to {args.out}")


if __name__ == "__main__":
    main()

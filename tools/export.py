#!/usr/bin/env python
"""Export a self-contained AOT serving artifact (jax.export / StableHLO).

The TPU-native analogue of the reference's TVM deployment flow
(``/root/reference/nano_demo/README.md``: compile a relay ``.so`` per model,
load it from a generic runtime).  The artifact bakes the weights and the
entire fused serving program (forward + on-device decode) for a fixed
batch/input shape; serve it from any JAX process via
``litepose_tpu.core.export.load_artifact`` (no model code needed) —

    serve = load_artifact("auto_s.stablehlo")
    people, scores, counts = serve(images_u8)   # (B, H, W, 3) uint8

A CPU host can export TPU artifacts (kernel lowering is pinned to the
target platform), so artifact builds fit in CI.

Usage:
  python tools/export.py --arch auto-S --weights ckpt.msgpack \
      --batch 64 --platform tpu --out auto_s.stablehlo
  python tools/export.py --arch auto-XS --exact --eval-decode \
      --platform cpu --out auto_xs_cpu.stablehlo
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="auto-S", help="zoo name or arch JSON path")
    p.add_argument("--weights", default=None,
                   help=".msgpack or torch .pth/.tar weights (random init if absent)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--input-size", type=int, default=None,
                   help="square input size (default: the arch's native size)")
    p.add_argument("--platform", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--num-joints", type=int, default=14)
    p.add_argument("--dataset", default="CROWDPOSE", choices=["CROWDPOSE", "COCO"])
    p.add_argument("--flip-test", action="store_true",
                   help="bake the flip-test (eval protocol) into the program")
    p.add_argument("--project2image", action="store_true",
                   help="project heatmaps to input size before decode")
    p.add_argument("--exact", action="store_true",
                   help="exact top-k + Hungarian decode (eval parity) instead "
                        "of the approx+greedy serving fast path")
    p.add_argument("--eval-decode", action="store_true",
                   help="run adjust+refine after grouping (eval semantics)")
    p.add_argument("--detection-threshold", type=float, default=0.1)
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from litepose_tpu.arch import load_arch
    from litepose_tpu.arch.zoo import ARCH_ZOO
    from litepose_tpu.core.engine import EngineConfig, PoseEngine
    from litepose_tpu.core.export import export_engine, save_artifact
    from litepose_tpu.core.inference import InferenceFlags
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.ops.group_ref import GroupParams

    arch = ARCH_ZOO[args.arch] if args.arch in ARCH_ZOO else load_arch(args.arch)
    if args.input_size:
        arch = arch.with_img_size(args.input_size)
    spec = ModelSpec(num_joints=args.num_joints)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    if args.weights:
        if args.weights.endswith((".pth", ".tar")):
            from litepose_tpu.models.torch_convert import (
                litepose_from_torch,
                load_torch_checkpoint,
            )
            params, state = litepose_from_torch(
                load_torch_checkpoint(args.weights), spec, arch)
        else:
            from litepose_tpu.train.checkpoint import load_params
            params, state = load_params(args.weights, params, state)
    else:
        print("WARNING: exporting randomly-initialized weights", file=sys.stderr)

    import jax.numpy as jnp

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False,
                                 out_dtype=jnp.bfloat16)
        return outs

    ds_key = "crowd_pose_kpt" if args.dataset == "CROWDPOSE" else "coco_kpt"
    flags = InferenceFlags(
        num_joints=args.num_joints,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=args.flip_test, flip_index=tuple(flip_index_for(ds_key)),
        decode_bf16=not args.eval_decode,
    )
    group = GroupParams(num_joints=args.num_joints,
                        detection_threshold=args.detection_threshold,
                        nms_kernel=5, nms_padding=2)
    engine = PoseEngine(
        apply_fn, params, state, flags, group,
        EngineConfig(
            input_size=arch.img_size, scale_factors=(1.0,),
            with_adjust=args.eval_decode, with_refine=args.eval_decode,
            project2image=args.project2image,
            assignment="hungarian" if args.exact else "greedy",
            topk_method="exact" if args.exact else "approx",
        ),
    )
    exported = export_engine(engine, args.batch, platform=args.platform)
    info = save_artifact(exported, args.out)
    print(f"wrote {args.out}: platform={info.platform} batch={info.batch} "
          f"input={info.in_hw[0]}x{info.in_hw[1]}x3 uint8 "
          f"size={info.nbytes / 1e6:.1f} MB")
    print("outputs:", [tuple(a.shape) for a in exported.out_avals])


if __name__ == "__main__":
    main()

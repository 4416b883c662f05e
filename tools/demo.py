#!/usr/bin/env python
"""Deployment demo: pose estimation over images or video.

The nano_demo equivalent (``/root/reference/nano_demo/start.py`` +
``core/__init__.py``): serving-mode settings (single scale, no flip /
adjust / refine — the reference demo's get_cfg disables these,
core/__init__.py:106-116), square center-crop preprocessing, skeleton
rendering.  Backend: TPU engine, or ``--backend native`` for the C++ host
decoder (no accelerator needed for decode).

  python tools/demo.py --weights ckpt.msgpack --arch auto-XS \
      --input photos/ --output out/ [--backend tpu|native]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None, help=".msgpack or .pth weights (random init if absent)")
    p.add_argument("--arch", default="auto-XS", help="zoo name or arch JSON path")
    p.add_argument("--input", required=True, help="image file, directory, or video")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--num-joints", type=int, default=14)
    p.add_argument("--dataset", default="CROWDPOSE", choices=["CROWDPOSE", "COCO"])
    p.add_argument("--backend", default="tpu", choices=["tpu", "native"])
    p.add_argument("--input-size", type=int, default=448)
    return p.parse_args()


def center_crop_square(image, size):
    """720p-style center crop + resize (reference start.py:34-41)."""
    import cv2

    h, w = image.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    return cv2.resize(image[y0 : y0 + s, x0 : x0 + s], (size, size))


def main():
    args = parse_args()
    import cv2
    import jax
    import numpy as np

    from litepose_tpu.arch import load_arch
    from litepose_tpu.arch.zoo import ARCH_ZOO
    from litepose_tpu.core.engine import EngineConfig, PoseEngine
    from litepose_tpu.core.inference import InferenceFlags
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.ops.group_ref import GroupParams
    from litepose_tpu.utils.vis import draw_skeleton

    arch = ARCH_ZOO[args.arch] if args.arch in ARCH_ZOO else load_arch(args.arch)
    arch = arch.with_img_size(args.input_size)
    spec = ModelSpec(num_joints=args.num_joints)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    if args.weights:
        if args.weights.endswith((".pth", ".tar")):
            from litepose_tpu.models.torch_convert import (
                litepose_from_torch,
                load_torch_checkpoint,
            )

            params, state = litepose_from_torch(load_torch_checkpoint(args.weights), spec, arch)
        else:
            from litepose_tpu.train.checkpoint import load_params

            params, state = load_params(args.weights, params, state)

    ds_key = "crowd_pose_kpt" if args.dataset == "CROWDPOSE" else "coco_kpt"
    group = GroupParams(num_joints=args.num_joints, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)

    if args.backend == "tpu":
        def apply_fn(p, s, x):
            outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
            return outs

        flags = InferenceFlags(
            num_joints=args.num_joints,
            with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
            test_with_heatmaps=(True, True), test_with_ae=(True, False),
            flip_test=False, flip_index=tuple(flip_index_for(ds_key)),
        )
        engine = PoseEngine(
            apply_fn, params, state, flags, group,
            EngineConfig(input_size=args.input_size, scale_factors=(1.0,),
                         with_adjust=False, with_refine=False, project2image=False,
                         assignment="greedy", topk_method="approx"),
        )

        def infer(img_sq):
            people, scores = engine.process(img_sq)
            return people, scores
    else:
        import jax.numpy as jnp

        from litepose_tpu.core.inference import make_infer_fn, to_decode_layout
        from litepose_tpu.native import NativeHeatmapParser

        flags = InferenceFlags(
            num_joints=args.num_joints,
            with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
            test_with_heatmaps=(True, True), test_with_ae=(True, False),
            flip_test=False, flip_index=tuple(flip_index_for(ds_key)),
        )
        infer_fn = jax.jit(make_infer_fn(
            lambda p, s, x: apply_litepose(p, s, x, spec, arch, train=False)[0], flags
        ))
        parser = NativeHeatmapParser(group)

        def infer(img_sq):
            heat, tag = infer_fn(params, state, img_sq[None])
            det, tagt = to_decode_layout(heat, tag)
            people, scores = parser.parse(np.asarray(det[0]), np.asarray(tagt[0]))
            # scale decode coords (heatmap res) back to the square image
            scale = img_sq.shape[0] / det.shape[-1]
            for person in people:
                person[:, :2] *= scale
            return list(people), scores

    os.makedirs(args.output, exist_ok=True)

    def frames():
        if os.path.isdir(args.input):
            for path in sorted(glob.glob(os.path.join(args.input, "*"))):
                img = cv2.imread(path)
                if img is not None:
                    yield os.path.basename(path), cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        elif args.input.lower().endswith((".mp4", ".avi", ".mov")):
            cap = cv2.VideoCapture(args.input)
            i = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield f"frame_{i:06d}.jpg", cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                i += 1
        else:
            img = cv2.imread(args.input)
            yield os.path.basename(args.input), cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    n, t0 = 0, time.time()
    for name, image in frames():
        sq = center_crop_square(image, args.input_size)
        people, scores = infer(sq)
        canvas = draw_skeleton(sq, people, args.dataset)
        cv2.imwrite(os.path.join(args.output, name), cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        n += 1
        if n % 10 == 0:
            print(f"{n} frames ({n / (time.time() - t0):.2f} fps)")
    print(f"done: {n} frames -> {args.output} ({n / max(time.time() - t0, 1e-9):.2f} fps)")


if __name__ == "__main__":
    main()

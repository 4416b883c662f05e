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
    p.add_argument("--input", required=True,
                   help="image file, directory, video, or a camera index like "
                        "'0' / 'camera' for live capture")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--num-joints", type=int, default=14)
    p.add_argument("--dataset", default="CROWDPOSE", choices=["CROWDPOSE", "COCO"])
    p.add_argument("--backend", default="tpu", choices=["tpu", "native"])
    p.add_argument("--input-size", type=int, default=448)
    p.add_argument("--live", action="store_true",
                   help="threaded latest-frame capture loop (implied for "
                        "camera inputs; also works on video files)")
    p.add_argument("--no-display", action="store_true",
                   help="live mode: skip cv2.imshow, write periodic snapshots")
    p.add_argument("--max-frames", type=int, default=0,
                   help="live mode: stop after N frames (0 = run until source ends)")
    return p.parse_args()


class LatestFrameCapture:
    """Threaded capture that always holds only the freshest frame, so a slow
    model never falls behind a fast camera (reference
    ``nano_demo/start.py:34-41`` semantics: 720p capture thread feeding the
    inference loop)."""

    def __init__(self, source, width=1280, height=720):
        import threading

        import cv2

        self.cap = cv2.VideoCapture(source)
        if isinstance(source, int):
            self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
            self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        self._lock = threading.Lock()
        self._frame = None
        self.running = False
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        if not self.cap.isOpened():
            raise RuntimeError("could not open capture source")
        self.running = True
        self._thread.start()
        return self

    def _loop(self):
        while self.running:
            ok, frame = self.cap.read()
            if not ok:
                self.running = False
                break
            with self._lock:
                self._frame = frame

    def read(self):
        """Pop the freshest frame (None if nothing new since the last pop)."""
        with self._lock:
            frame, self._frame = self._frame, None
        return frame

    def stop(self):
        self.running = False
        self._thread.join(timeout=2.0)
        self.cap.release()


def run_live(source, infer, args, draw_skeleton):
    """Live loop: threaded capture -> infer -> skeleton + fps overlay ->
    display (or snapshot files when headless), mirroring the reference
    webcam app (``nano_demo/start.py:94-115``)."""
    import cv2

    cap = LatestFrameCapture(source).start()
    display = bool(os.environ.get("DISPLAY")) and not args.no_display
    fps = 0.0
    n, t0 = 0, time.time()
    try:
        while cap.running or True:
            frame = cap.read()
            if frame is None:
                if not cap.running:
                    break
                time.sleep(0.002)
                continue
            sq = center_crop_square(
                cv2.cvtColor(frame, cv2.COLOR_BGR2RGB), args.input_size
            )
            t1 = time.time()
            people, scores = infer(sq)
            dt = max(time.time() - t1, 1e-6)
            fps = (0.9 * fps + 0.1 / dt) if fps else 1.0 / dt
            canvas = cv2.cvtColor(draw_skeleton(sq, people, args.dataset),
                                  cv2.COLOR_RGB2BGR)
            cv2.putText(canvas, f"{fps:5.1f} fps", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
            if display:
                cv2.imshow("litepose_tpu", canvas)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            elif n % 10 == 0:
                cv2.imwrite(
                    os.path.join(args.output, f"live_{n:06d}.jpg"), canvas
                )
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    finally:
        cap.stop()
        if display:
            cv2.destroyAllWindows()
    wall = max(time.time() - t0, 1e-9)
    print(f"live: {n} frames in {wall:.1f}s ({n / wall:.2f} fps e2e, "
          f"{fps:.2f} fps model)")


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

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

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

    cam = args.input.lower() in ("camera", "webcam") or args.input.isdigit()
    if cam or args.live:
        source = int(args.input) if args.input.isdigit() else (
            0 if cam else args.input
        )
        run_live(source, infer, args, draw_skeleton)
        return

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

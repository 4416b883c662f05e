#!/usr/bin/env python
"""Serve-step batch-size sweep (single chip, trained bench checkpoint).

Finds the throughput-optimal serving batch size for a given architecture by
measuring the fused forward+decode program across a batch-size ladder with
the same K-loop / full-sum-feedback methodology as bench.py (see
PERF_NOTES.md "Measurement methodology" — single-call wall-clocks are
unreliable through the axon tunnel, and init-identity weights measure a
different XLA program than trained ones, so the trained checkpoint is
loaded when present).

Reference scale: the reference benchmarks single-image latency on edge GPUs
(/root/reference/README.md:26-29); on TPU the free variable is batch size,
which this tool sweeps.

Usage:
    python tools/sweep_serve.py --batches 48 64 80 96 112 128
    python tools/sweep_serve.py --arch auto-XS --no-ckpt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", default="auto-S", help="zoo arch name")
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[48, 64, 80, 96, 112, 128])
    ap.add_argument("--ckpt", default=None,
                    help="msgpack checkpoint (default: assets/bench_ckpt.msgpack)")
    ap.add_argument("--no-ckpt", action="store_true",
                    help="random init (WARNING: identity-BN values measure a "
                         "different XLA program; see PERF_NOTES.md)")
    ap.add_argument("--iters", type=int, default=4, help="K-loop length")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.inference import (
        InferenceFlags, make_infer_fn, to_decode_layout)
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.data.synthetic import bench_scene_batch
    from litepose_tpu.models.litepose import (
        ModelSpec, apply_litepose, init_litepose)
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch
    from litepose_tpu.ops.group_ref import GroupParams

    arch = get_arch(args.arch)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)

    ckpt = args.ckpt or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "bench_ckpt.msgpack")
    if not args.no_ckpt and os.path.isfile(ckpt):
        from litepose_tpu.train.checkpoint import load_params
        params, state = load_params(ckpt, params, state)
        print(f"# trained checkpoint: {ckpt}", file=sys.stderr)
    else:
        print("# random-init weights (numbers NOT comparable to trained-ckpt "
              "benches)", file=sys.stderr)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False,
                                 out_dtype=jnp.bfloat16)
        return outs

    flags = InferenceFlags(
        num_joints=14,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=False, flip_index=tuple(flip_index_for("crowd_pose_kpt")),
        decode_bf16=True,
    )
    infer = make_infer_fn(apply_fn, flags)
    gcfg = StaticGroupCfg.from_params(
        GroupParams(num_joints=14, detection_threshold=0.1,
                    nms_kernel=5, nms_padding=2),
        assignment="greedy", topk_method="approx",
    )

    def serve_body(images):
        heat, tag = infer(params, state, images)
        det, tagt = to_decode_layout(heat, tag)
        return parse_batch(det, tagt, gcfg, False, False)

    def make_runner(K):
        def body(i, carry):
            images, acc = carry
            _, scores, _ = serve_body(
                jnp.clip(images + acc * 1e-9, 0, 255).astype(jnp.uint8))
            return images, jnp.sum(scores) * 1e-9

        @jax.jit
        def run(images):
            _, acc = lax.fori_loop(
                0, K, body, (images.astype(jnp.float32), jnp.float32(0)))
            return acc

        return run

    def measure(bs):
        images = jax.device_put(bench_scene_batch(bs, arch.img_size))
        run1, runK = make_runner(1), make_runner(args.iters)
        float(run1(images)); float(runK(images))  # compile
        t1s, tKs = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter(); float(run1(images))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(runK(images))
            tKs.append(time.perf_counter() - t0)
        dt = (float(np.median(tKs)) - float(np.median(t1s))) / (args.iters - 1)
        return bs / dt, dt

    best = (0.0, 0)
    for bs in args.batches:
        try:
            ips, dt = measure(bs)
            print(f"bs={bs:4d}: {ips:7.1f} img/s  ({dt * 1e3:6.2f} ms/batch)",
                  flush=True)
            if ips > best[0]:
                best = (ips, bs)
        except Exception as e:  # OOM at large batch etc.
            print(f"bs={bs:4d}: failed ({e})", flush=True)
    if best[1]:
        print(f"# best: bs={best[1]} at {best[0]:.1f} img/s", file=sys.stderr)


if __name__ == "__main__":
    main()

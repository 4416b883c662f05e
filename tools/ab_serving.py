"""A/B the serving-bench harness + program-level pipelining (VERDICT r4 #2).

Round 3 measured 1241.9 img/s with weights CLOSED OVER the jitted body and
a Python-level timing loop; round 4 changed the harness (weights as jit
arguments + traced-K fori_loop chaining) and read 1216.8.  Nobody measured
the harness delta itself.  This tool times the SAME serve program under:

  A. r4 harness: weights as jit args, traced-K chained fori_loop
  B. r3 harness: weights closed over, traced-K chained fori_loop
  C. async-dispatch pipelining: M back-to-back dispatches of the plain
     jitted batch program (the double-buffered `process_indexed` drive
     pattern), block once at the end — steady-state wall/M.  This is what
     a production serving loop actually achieves: JAX dispatch is async,
     so host work overlaps device compute and no chained data dependency
     serializes consecutive batches.

Reference deploy path being modeled: the TVM module loop in
/root/reference/nano_demo/core/__init__.py:35-80 (one image per call).

Run on the TPU host:  python tools/ab_serving.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--M", type=int, default=24, help="async-dispatch depth")
    ap.add_argument("--skip-async", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import os

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.inference import (InferenceFlags, make_infer_fn,
                                             to_decode_layout)
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.data.synthetic import bench_scene_batch
    from litepose_tpu.models.litepose import (ModelSpec, apply_litepose,
                                              init_litepose)
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch
    from litepose_tpu.ops.group_ref import GroupParams
    from litepose_tpu.train.checkpoint import load_params

    arch = get_arch("auto-S")
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "bench_ckpt.msgpack")
    params, state = load_params(ckpt, params, state)

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

    def serve_body(p, s, images):
        heat, tag = infer(p, s, images)
        det, tagt = to_decode_layout(heat, tag)
        return parse_batch(det, tagt, gcfg, False, False)

    bs = args.batch
    images = jax.device_put(bench_scene_batch(bs, arch.img_size))
    K, reps = args.K, args.reps

    # ---- A: r4 harness (weights as args, traced K) ----------------------
    @jax.jit
    def run_a(images, K, p, s):
        def body(i, carry):
            images, acc = carry
            _, scores, _ = serve_body(
                p, s, jnp.clip(images + acc * 1e-9, 0, 255).astype(jnp.uint8))
            return images, jnp.sum(scores) * 1e-9
        _, acc = lax.fori_loop(0, K, body,
                               (images.astype(jnp.float32), jnp.float32(0)))
        return acc

    # ---- B: r3 harness (weights closed over, traced K) ------------------
    @jax.jit
    def run_b(images, K):
        def body(i, carry):
            images, acc = carry
            _, scores, _ = serve_body(
                params, state,
                jnp.clip(images + acc * 1e-9, 0, 255).astype(jnp.uint8))
            return images, jnp.sum(scores) * 1e-9
        _, acc = lax.fori_loop(0, K, body,
                               (images.astype(jnp.float32), jnp.float32(0)))
        return acc

    def chained(run, *extra):
        k1, kK = jnp.int32(1), jnp.int32(K)
        float(run(images, k1, *extra)); float(run(images, kK, *extra))
        t1s, tKs = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); float(run(images, k1, *extra))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(run(images, kK, *extra))
            tKs.append(time.perf_counter() - t0)
        dt = (float(np.median(tKs)) - float(np.median(t1s))) / (K - 1)
        return bs / dt, dt

    ips_a, dt_a = chained(run_a, params, state)
    print(f"A  r4 harness (weights-as-args, chained K): "
          f"{ips_a:.1f} img/s ({dt_a * 1e3:.2f} ms/b{bs})")
    ips_b, dt_b = chained(run_b)
    print(f"B  r3 harness (closure weights,  chained K): "
          f"{ips_b:.1f} img/s ({dt_b * 1e3:.2f} ms/b{bs})")

    # ---- C: async-dispatch pipelining ------------------------------------
    if args.skip_async:
        return
    serve_jit = jax.jit(serve_body)
    out = serve_jit(params, state, images)
    jax.block_until_ready(out)
    M = args.M
    for warm in range(2):
        t0 = time.perf_counter()
        outs = None
        for _ in range(M):
            outs = serve_jit(params, state, images)
        jax.block_until_ready(outs)
        wall = time.perf_counter() - t0
    dt_c = wall / M
    print(f"C  async-dispatch xM={M} (plain jit, block once): "
          f"{bs / dt_c:.1f} img/s ({dt_c * 1e3:.2f} ms/b{bs})")

    # C with host-side result readback each step (production drain pattern:
    # np.asarray on batch k-1 while batch k computes)
    pending = None
    t0 = time.perf_counter()
    for _ in range(M):
        nxt = serve_jit(params, state, images)
        if pending is not None:
            _ = tuple(np.asarray(x) for x in pending)
        pending = nxt
    _ = tuple(np.asarray(x) for x in pending)
    wall = time.perf_counter() - t0
    dt_d = wall / M
    print(f"D  async-dispatch + per-batch host readback: "
          f"{bs / dt_d:.1f} img/s ({dt_d * 1e3:.2f} ms/b{bs})")


if __name__ == "__main__":
    main()

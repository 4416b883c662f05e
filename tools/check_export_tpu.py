#!/usr/bin/env python
"""Prove the AOT export flow on real TPU hardware.

Exports the fused serving program (Auto-XS, Mosaic decode kernels baked)
with ``jax.export``, serializes + reloads it, and drives BOTH the artifact
and the live engine on the chip:

  * weights-as-arguments artifact must be bit-identical to the live jit
    (same HLO, same compiler) — asserted;
  * artifact latency vs live-engine latency reported (K-loop methodology).

Reference analogue: the TVM ``.so`` deploy flow
(`/root/reference/nano_demo/core/__init__.py:83-101`) — load a compiled
artifact, run it without model code.

Usage: python tools/check_export_tpu.py [--batch 8]
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
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.engine import EngineConfig, PoseEngine
    from litepose_tpu.core.export import (export_engine, fused_body,
                                          load_artifact, save_artifact)
    from litepose_tpu.core.inference import InferenceFlags
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models.litepose import (ModelSpec, apply_litepose,
                                              init_litepose)
    from litepose_tpu.ops.group_ref import GroupParams

    assert jax.default_backend() == "tpu", "this check must run on the chip"

    arch = get_arch("auto-XS")
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(1), spec, arch)
    ckpt = os.path.join(REPO, "assets", "bench_ckpt_xs.msgpack")
    if os.path.isfile(ckpt):
        from litepose_tpu.train.checkpoint import load_params
        params, state = load_params(ckpt, params, state)
        print(f"# params from {ckpt}", flush=True)

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
    group = GroupParams(num_joints=14, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)
    eng = PoseEngine(
        apply_fn, params, state, flags, group,
        EngineConfig(input_size=arch.img_size, scale_factors=(1.0,),
                     with_adjust=False, with_refine=False, project2image=False,
                     assignment="greedy", topk_method="approx"),
    )

    B = args.batch
    from litepose_tpu.data.synthetic import bench_scene_batch
    imgs = jax.device_put(bench_scene_batch(B, arch.img_size))

    # ---- live program ----
    fused = jax.jit(fused_body(eng, interpret=False))
    live = jax.block_until_ready(fused(eng.params, eng.state, imgs))

    # ---- export -> serialize -> reload -> run on chip ----
    exported = export_engine(eng, batch=B, platform="tpu", bake_params=False)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "auto_xs.stablehlo")
        info = save_artifact(exported, path)
        print(f"# artifact: {info.nbytes / 1e6:.2f} MB, platform={info.platform}, "
              f"batch={info.batch}, in_hw={info.in_hw}", flush=True)
        art = load_artifact(path)
        got = jax.block_until_ready(art(eng.params, eng.state, imgs))

    names = ("people", "scores", "counts")
    for name, a, b in zip(names, live, got):
        if not jnp.array_equal(a, b):
            print(f"FAIL: artifact {name} differs from live engine", flush=True)
            sys.exit(1)
    print("# artifact outputs BIT-IDENTICAL to live engine on TPU", flush=True)

    # ---- latency (K-loop; scalar feedback through the scores) ----
    from jax import lax

    def measure(callee, K=8, N=3):
        # tunnel-compile rules: weights as args, K traced (one program)
        @jax.jit
        def run(x, K, p, s):
            def body(i, carry):
                x, acc = carry
                people, scores, n = callee(
                    p, s, jnp.clip(x + acc * 1e-9, 0, 255).astype(jnp.uint8))
                return x, jnp.sum(scores) * 1e-9
            _, acc = lax.fori_loop(0, K, body, (x, jnp.float32(0)))
            return acc
        x = imgs.astype(jnp.float32)
        K1, KK = jnp.int32(1), jnp.int32(K)
        p, s = eng.params, eng.state
        float(run(x, K1, p, s)); float(run(x, KK, p, s))
        t1s, tKs = [], []
        for _ in range(N):
            t0 = time.perf_counter(); float(run(x, K1, p, s)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(run(x, KK, p, s)); tKs.append(time.perf_counter() - t0)
        return (float(np.median(tKs)) - float(np.median(t1s))) / (K - 1)

    dt_live = measure(fused)
    dt_art = measure(art)
    print(f"live engine : {dt_live * 1e3:7.2f} ms/b{B} = {B / dt_live:7.1f} img/s",
          flush=True)
    print(f"artifact    : {dt_art * 1e3:7.2f} ms/b{B} = {B / dt_art:7.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end serving throughput benchmark (real TPU).

Flagship config: LitePose-Auto-S (5.0 GMAC searched arch) at 448x448,
bf16 compute, with on-device decode (NMS + top-k + AE grouping) fused into
the same XLA program as the forward pass — the pipeline a production
deployment runs per batch.  Serving semantics mirror the reference's own
deployment path (nano_demo disables flip/adjust/refine,
/root/reference/nano_demo/core/__init__.py:106-116); the eval path
(tools/valid.py) keeps flip/adjust/refine for mAP parity.

Prints ONE json line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N / 5000.0}
(5000 img/s/chip is the BASELINE.json north-star target.)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.inference import InferenceFlags, make_infer_fn, to_decode_layout
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch
    from litepose_tpu.ops.group_ref import GroupParams

    arch = get_arch("auto-S")  # 448x448, 5.0 GMACs
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
        return outs

    flags = InferenceFlags(
        num_joints=14,
        with_heatmaps_loss=(True, True),
        with_ae_loss=(True, False),
        test_with_heatmaps=(True, True),
        test_with_ae=(True, False),
        flip_test=False,
        flip_index=tuple(flip_index_for("crowd_pose_kpt")),
        decode_bf16=True,  # serving: halve decode-glue HBM traffic
    )
    infer = make_infer_fn(apply_fn, flags)
    gcfg = StaticGroupCfg.from_params(
        GroupParams(num_joints=14, detection_threshold=0.1, nms_kernel=5, nms_padding=2),
        assignment="greedy", topk_method="approx",  # serving fast path
    )

    def serve_body(params, state, images):
        heat, tag = infer(params, state, images)
        det, tagt = to_decode_layout(heat, tag)
        return parse_batch(det, tagt, gcfg, False, False)

    # Timing methodology: the axon tunnel acks block_until_ready early and
    # adds a fixed ~26 ms readback round-trip, so wall-clocking single calls
    # is unreliable (see PERF_NOTES.md).  Measure K chained iterations
    # inside one jit with a scalar readback and difference K=1 vs K.
    # Each iteration feeds a scores-derived scalar back into the images so
    # XLA can neither fold the dependency (x + s*0 would fold) nor hoist the
    # loop-invariant body; the uint8 cast keeps the pixel values identical.
    from jax import lax as _lax
    import jax.numpy as jnp

    def make_runner(K, body_fn):
        def body(i, carry):
            images, acc = carry
            people, scores, n = body_fn(
                params, state,
                jnp.clip(images + acc * 1e-9, 0, 255).astype(jnp.uint8))
            return images, jnp.sum(scores) * 1e-9
        @jax.jit
        def run(images):
            _, acc = _lax.fori_loop(0, K, body, (images.astype(jnp.float32), jnp.float32(0)))
            return acc
        return run

    rng = np.random.default_rng(0)

    # Calibrate the detection threshold so the decoder sees a realistic
    # peak load (~6 peaks/joint) despite randomly initialized weights: with
    # trained weights and real images, detection_threshold=0.1 yields a few
    # peaks per joint; random-init heatmaps would pathologically pass all 30
    # (see PERF_NOTES.md on the decode's valid-peak prefix optimization).
    sample = rng.integers(0, 255, (8, arch.img_size, arch.img_size, 3)).astype(np.uint8)
    import jax.numpy as jnp
    from litepose_tpu.ops.nms import top_k_peaks as _tkp

    def _peek(params, state, images_u8):
        heat, tag = infer(params, state, images_u8)
        det, tagt = to_decode_layout(heat, tag)
        _, _, val_k = jax.vmap(lambda d, t: _tkp(d, t, 30, 5, 2))(det, tagt)
        return val_k
    val_k = np.asarray(jax.jit(_peek)(params, state, sample))
    thr = float(np.median(val_k[:, :, 6]))
    gcfg = gcfg._replace(detection_threshold=thr)
    print(f"# calibrated detection threshold: {thr:.4f}", file=sys.stderr)

    def measure(body_fn, bs, K=4, N=3):
        images = rng.integers(0, 255, (bs, arch.img_size, arch.img_size, 3)).astype(np.uint8)
        images = jax.device_put(images)
        run1, runK = make_runner(1, body_fn), make_runner(K, body_fn)
        float(run1(images)); float(runK(images))  # compile
        t1s, tKs = [], []
        for _ in range(N):
            t0 = time.perf_counter(); float(run1(images)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(runK(images)); tKs.append(time.perf_counter() - t0)
        dt = (float(np.median(tKs)) - float(np.median(t1s))) / (K - 1)
        return bs / dt, dt

    best = 0.0
    best_bs = 0
    for bs in (64, 128):
        try:
            ips, dt = measure(serve_body, bs)
            print(f"# batch={bs}: {ips:.1f} img/s ({dt * 1e3:.1f} ms/batch)", file=sys.stderr)
            if ips > best:
                best, best_bs = ips, bs
        except Exception as e:  # OOM at large batch etc.
            print(f"# batch={bs} failed: {e}", file=sys.stderr)

    # Emit the driver-facing JSON line BEFORE the slower eval-parity bench so
    # an external timeout during the extra section can't lose the main result.
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / 5000.0, 4),
                "detail": f"LitePose-Auto-S@448 bf16 fwd+decode fused, batch={best_bs}",
            }
        ),
        flush=True,
    )

    # Eval-parity decode mode (exact Hungarian + exact top-k + adjust/refine,
    # the tools/valid.py semantics) benchmarked alongside serving so eval
    # throughput regressions are visible.  Reported on stderr to keep the
    # driver-facing stdout single-JSON.
    try:
        gcfg_eval = gcfg._replace(assignment="hungarian", topk_method="exact")
        infer_eval = make_infer_fn(apply_fn, flags._replace(decode_bf16=False))

        def eval_body(params, state, images):
            heat, tag = infer_eval(params, state, images)
            det, tagt = to_decode_layout(heat, tag)
            return parse_batch(det, tagt, gcfg_eval, True, True)

        ips_e, dt_e = measure(eval_body, 64, K=3, N=2)
        print(json.dumps({
            "metric": "eval_parity_images_per_sec_per_chip",
            "value": round(ips_e, 1), "unit": "img/s",
            "detail": "hungarian+exact-topk+adjust+refine, batch=64",
        }), file=sys.stderr)
    except Exception as e:
        print(f"# eval-parity bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Eval-protocol decomposition profiler (trained weights, real TPU).

Breaks the full mAP-protocol step (flip test + project2image + exact decode,
reference pipeline /root/reference/valid.py:195-245) into measured pieces so
the protocol throughput number has a budget behind it:

  * flip-concat forward      — one 2B-batch eval forward (fp32 stage outs)
  * infer glue               — flip merge + transpose + 448^2 projection
  * exact NMS+top-k          — fused Pallas kernel at the decode resolution
  * grouping (hungarian)     — lane-vectorized JV Pallas kernel
  * adjust + refine          — quarter-pixel shift + penalized-argmax fill
  * total protocol step      — everything chained (the bench.py number)

Timing methodology as in tools/profile_model.py / PERF_NOTES.md: K-chained
iterations inside one jit with scalar feedback, differenced K vs 1, because
the axon tunnel acks early and adds a fixed readback round-trip.

Usage: python tools/profile_eval.py [--batch 32] [--arch auto-S]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="auto-S")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.inference import InferenceFlags, make_infer_fn
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch
    from litepose_tpu.ops.group_ref import GroupParams

    B = args.batch
    arch = get_arch(args.arch)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    ckpt = args.ckpt or os.path.join(REPO, "assets", "bench_ckpt.msgpack")
    if os.path.isfile(ckpt):
        from litepose_tpu.train.checkpoint import load_params
        params, state = load_params(ckpt, params, state)
        print(f"# params from {ckpt}", flush=True)
    else:
        sys.exit("trained checkpoint required (identity-BN artifact)")

    from litepose_tpu.data.synthetic import bench_scene_batch
    images = jax.device_put(bench_scene_batch(B, arch.img_size))
    print(f"# backend={jax.default_backend()} arch={args.arch} "
          f"img={arch.img_size} batch={B}", flush=True)

    def report(label, dt):
        print(f"{label:46s} {dt * 1e3:8.2f} ms/b{B} = {B / dt:7.1f} img/s",
              flush=True)

    def kloop(make_body, x, K=4, N=3, consts=()):
        # Two tunnel-compile rules (each violated once, each costly):
        # * large device operands ride as ARGUMENTS (``consts``), never jit
        #   closures — closed-over buffers serialize into the remote-compile
        #   request and blow the tunnel's length limit (HTTP 413);
        # * the trip count K is a TRACED argument, so the K=1 and K=K
        #   timings share ONE compiled program (remote compiles run minutes
        #   each; two programs per section doubled every measurement wave).
        @jax.jit
        def run(x, K, *consts):
            def body(i, carry):
                return make_body(i, carry, *consts)
            _, acc = lax.fori_loop(0, K, body, (x, jnp.float32(0)),
                                   unroll=False)
            return acc
        K1 = jnp.int32(1); KK = jnp.int32(K)
        float(run(x, K1, *consts)); float(run(x, KK, *consts))
        t1s, tKs = [], []
        for _ in range(N):
            t0 = time.perf_counter(); float(run(x, K1, *consts)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(run(x, KK, *consts)); tKs.append(time.perf_counter() - t0)
        return (float(np.median(tKs)) - float(np.median(t1s))) / (K - 1)

    flags = InferenceFlags(
        num_joints=14, with_heatmaps_loss=(True, True),
        with_ae_loss=(True, False), test_with_heatmaps=(True, True),
        test_with_ae=(True, False), flip_test=True,
        flip_index=tuple(flip_index_for("crowd_pose_kpt")),
    )

    def apply_eval(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False)
        return outs

    HW = (arch.img_size, arch.img_size)
    infer_proto = make_infer_fn(apply_eval, flags, project_hw=HW,
                                decode_layout=True)
    gcfg = StaticGroupCfg.from_params(
        GroupParams(num_joints=14, detection_threshold=0.1, nms_kernel=5,
                    nms_padding=2),
        assignment="hungarian", topk_method="exact",
    )

    imf = images.astype(jnp.float32)

    def feedback(x, acc):
        return jnp.clip(x + acc * 1e-9, 0, 255).astype(jnp.uint8)

    # ---- 1. flip-concat forward (2B batch, fp32 stage outs) ----------------
    def fwd_body(i, carry, params, state):
        x, acc = carry
        from litepose_tpu.core.inference import normalize_images
        xn = normalize_images(feedback(x, acc))
        outs = apply_eval(params, state, jnp.concatenate([xn, xn[:, :, ::-1, :]], 0))
        s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return x, s * 1e-9
    t_fwd = kloop(fwd_body, imf, consts=(params, state))
    report("flip-concat forward (2B)", t_fwd)

    # ---- 2. full infer (fwd + flip merge + transpose + project) ------------
    def infer_body(i, carry, params, state):
        x, acc = carry
        det, tagt = infer_proto(params, state, feedback(x, acc))
        return x, (jnp.sum(det) + jnp.sum(tagt)) * 1e-9
    t_infer = kloop(infer_body, imf, consts=(params, state))
    report("infer (fwd + glue + project 448^2)", t_infer)
    report("  -> glue (infer - forward)", t_infer - t_fwd)

    # Decode stages run on fixed det/tag captured once (chained via scalar
    # feedback into det so XLA can't hoist the body).
    det0, tag0 = jax.jit(infer_proto)(params, state, images)
    det0, tag0 = jax.device_put(det0), jax.device_put(tag0)

    from litepose_tpu.ops.pallas_topk import top_k_peaks_batch

    # ---- 3. exact NMS + top-k at decode resolution -------------------------
    def topk_body(i, carry, tag0):
        d, acc = carry
        tag_k, loc_k, val_k = top_k_peaks_batch(
            d + acc * 1e-30, tag0, gcfg.max_people, gcfg.nms_kernel,
            tag_layout="thw")
        return d, (jnp.sum(val_k) + jnp.sum(tag_k) + jnp.sum(loc_k)) * 1e-9
    t_topk = kloop(topk_body, det0, consts=(tag0,))
    report("exact NMS+top-k (Pallas, 448^2)", t_topk)

    # ---- 4. grouping (hungarian) on captured peaks -------------------------
    tag_k0, loc_k0, val_k0 = jax.jit(
        lambda d, t: top_k_peaks_batch(d, t, gcfg.max_people, gcfg.nms_kernel,
                                       tag_layout="thw")
    )(det0, tag0)
    from litepose_tpu.ops.pallas_group import match_by_tag_batch_pallas

    def group_body(i, carry, tk, lk):
        vk, acc = carry
        people, n_cl = match_by_tag_batch_pallas(tk, lk, vk + acc * 1e-30, gcfg)
        return vk, jnp.sum(people) * 1e-9
    t_group = kloop(group_body, val_k0.astype(jnp.float32), K=6,
                    consts=(tag_k0.astype(jnp.float32),
                            loc_k0.astype(jnp.float32)))
    report("grouping (lane-vectorized JV)", t_group)

    # ---- 5. adjust + refine ------------------------------------------------
    people0, _ = jax.jit(
        lambda tk, lk, vk: match_by_tag_batch_pallas(tk, lk, vk, gcfg)
    )(tag_k0.astype(jnp.float32), loc_k0.astype(jnp.float32),
      val_k0.astype(jnp.float32))
    from litepose_tpu.ops.group import adjust
    from litepose_tpu.ops.pallas_refine import refine_batch

    def adj_body(i, carry, det0):
        p, acc = carry
        out = jax.vmap(adjust)(p + acc * 1e-30, det0)
        return p, jnp.sum(out) * 1e-9
    t_adj = kloop(adj_body, people0, K=6, consts=(det0,))
    report("adjust (quarter-pixel)", t_adj)

    def refine_body(i, carry, det0, tag0):
        p, acc = carry
        out = refine_batch(p + acc * 1e-30, det0, tag0, tag_layout="thw")
        return p, jnp.sum(out) * 1e-9
    t_ref = kloop(refine_body, people0, K=6, consts=(det0, tag0))
    report("refine (penalized argmax fill)", t_ref)

    # ---- 6. total protocol step -------------------------------------------
    def proto_body(i, carry, params, state):
        x, acc = carry
        det, tagt = infer_proto(params, state, feedback(x, acc))
        people, scores, n = parse_batch(det, tagt, gcfg, True, True,
                                        tag_layout="thw")
        return x, jnp.sum(scores) * 1e-9
    t_total = kloop(proto_body, imf, consts=(params, state))
    report("TOTAL protocol step", t_total)
    pieces = t_infer + t_topk + t_group + t_adj + t_ref
    report("  sum of pieces", pieces)
    report("  scheduling slack (total - sum)", t_total - pieces)


if __name__ == "__main__":
    main()

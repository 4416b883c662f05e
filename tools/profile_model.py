#!/usr/bin/env python
"""Per-section model profiler (TPU-safe timing methodology).

Measures, on the current JAX backend:
  * full forward (eval mode, bf16 policy)
  * serve step (forward + fused decode, serving semantics)
  * backbone inverted-bottleneck cost per stage via shape-preserving chains
  * (optionally) the train step

Timing methodology (validated in PERF_NOTES.md): the remote-TPU tunnel acks
small programs early and adds a fixed readback cost, so every number comes
from K-iteration ``lax.fori_loop`` chains inside one jit, differencing K
against 1.  Feedback consumes the FULL output (or chains shape-preserving
ops directly) — a sliced readback lets XLA slice/DCE the op under test and
yields garbage.

Usage: python tools/profile_model.py [--arch auto-S] [--batch 64]
       [--train] [--sections]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--train", action="store_true", help="profile the train step too")
    ap.add_argument("--sections", action="store_true",
                    help="per-stage backbone chains (more compiles)")
    ap.add_argument("--forward-only", action="store_true",
                    help="skip the serve step (its Pallas decode kernels run "
                         "in interpret mode off-TPU — minutes on CPU)")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint to profile with; defaults to "
                         "assets/bench_ckpt.msgpack when present (arch "
                         "matches) — NEVER profile with freshly-initialized "
                         "params: BN/bias init identities let XLA delete the "
                         "epilogues and flip fusion decisions "
                         "(PERF_NOTES.md 'identity-BN artifact')")
    args = ap.parse_args()

    import jax

    from litepose_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import litepose_tpu.models.layers as L
    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.inference import InferenceFlags, make_infer_fn, to_decode_layout
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch
    from litepose_tpu.ops.group_ref import GroupParams

    B = args.batch
    arch = get_arch(args.arch)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    ckpt = args.ckpt
    if ckpt is None and args.arch == "auto-S":
        cand = os.path.join(REPO, "assets", "bench_ckpt.msgpack")
        ckpt = cand if os.path.isfile(cand) else None
    if ckpt:
        from litepose_tpu.train.checkpoint import load_params
        params, state = load_params(ckpt, params, state)
        print(f"# params from {ckpt}", flush=True)
    else:
        # perturb the init-identity affines so XLA cannot fold the BN/bias
        # epilogues away (PERF_NOTES.md "identity-BN artifact")
        prng = np.random.default_rng(7)
        perturb = lambda l: l + jnp.asarray(
            prng.uniform(0.01, 0.05, l.shape), l.dtype) if l.ndim == 1 else l
        params = jax.tree_util.tree_map(perturb, params)
        state = jax.tree_util.tree_map(perturb, state)
        print("# random init (affines perturbed off identity)", flush=True)
    rng = np.random.default_rng(0)
    print(f"# backend={jax.default_backend()} arch={args.arch} "
          f"img={arch.img_size} batch={B}", flush=True)

    def report(label, dt):
        print(f"{label:44s} {dt * 1e3:8.2f} ms/b{B} = {B / dt:7.1f} img/s", flush=True)

    def kloop(make_body, x, K=6, N=3, consts=()):
        # Tunnel-compile rules: large operands (weights, maps) ride as jit
        # ARGUMENTS — closures serialize into the axon remote-compile
        # request (slow tunnel, HTTP 413 at map sizes); the trip count is
        # TRACED so the K=1 and K=K timings share one compiled program.
        @jax.jit
        def run(x, K, *consts):
            def body(i, carry):
                return make_body(i, carry, *consts)
            _, acc = lax.fori_loop(0, K, body, (x, jnp.float32(0)), unroll=False)
            return acc
        K1 = jnp.int32(1); KK = jnp.int32(K)
        float(run(x, K1, *consts)); float(run(x, KK, *consts))
        t1s, tKs = [], []
        for _ in range(N):
            t0 = time.perf_counter(); float(run(x, K1, *consts)); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(run(x, KK, *consts)); tKs.append(time.perf_counter() - t0)
        return (float(np.median(tKs)) - float(np.median(t1s))) / (K - 1)

    # ---- full forward (eval) ------------------------------------------------
    xb = jnp.asarray(rng.standard_normal((B, arch.img_size, arch.img_size, 3)),
                     jnp.bfloat16)

    def fwd_body(i, carry, params, state):
        x, acc = carry
        outs, _ = apply_litepose(params, state, x, spec, arch, train=False,
                                 out_dtype=jnp.bfloat16)
        s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return (x * (1.0 + s * 1e-30)).astype(x.dtype), acc + s

    report("forward (eval, bf16)", kloop(fwd_body, xb, consts=(params, state)))

    # ---- serve step ---------------------------------------------------------
    if args.forward_only:
        return
    flags = InferenceFlags(
        num_joints=14, with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=False, flip_index=tuple(flip_index_for("crowd_pose_kpt")),
        decode_bf16=True,
    )

    def apply_bf16(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False,
                                 out_dtype=jnp.bfloat16)
        return outs

    infer = make_infer_fn(apply_bf16, flags)
    gcfg = StaticGroupCfg.from_params(
        GroupParams(num_joints=14, detection_threshold=0.3, nms_kernel=5,
                    nms_padding=2),
        assignment="greedy", topk_method="approx",
    )
    xu8 = jnp.asarray(rng.integers(0, 255, (B, arch.img_size, arch.img_size, 3)),
                      jnp.uint8)

    def serve_body(i, carry, params, state):
        images, acc = carry
        heat, tag = infer(params, state,
                          jnp.clip(images + acc * 1e-9, 0, 255).astype(jnp.uint8))
        det, tagt = to_decode_layout(heat, tag)
        people, scores, n = parse_batch(det, tagt, gcfg, False, False)
        return images, jnp.sum(scores) * 1e-9

    report("serve step (fwd + fused decode)",
           kloop(serve_body, xu8.astype(jnp.float32), consts=(params, state)))

    # ---- per-stage backbone chains ------------------------------------------
    if args.sections:
        hw = arch.img_size // 2  # stem is stride-2; stages apply their own
        cin = arch.input_channel
        for si, st in enumerate(arch.backbone_setting):
            hw //= st.stride
            c = st.channel
            exp, ker = st.block_setting[0]
            bp, bs = L.inv_bottleneck_init(jax.random.PRNGKey(si), c, c,
                                           ker=ker, exp=exp)
            # off-identity affines (PERF_NOTES "identity-BN artifact")
            prng = np.random.default_rng(si)
            off = lambda l: l + jnp.asarray(
                prng.uniform(0.01, 0.05, l.shape), l.dtype) if l.ndim == 1 else l
            bp = jax.tree_util.tree_map(off, bp)
            bs = jax.tree_util.tree_map(off, bs)
            xs = jnp.asarray(rng.standard_normal((B, hw, hw, c)), jnp.bfloat16)

            def blk_body(i, carry, bp, bs):
                x, acc = carry
                y, _ = L.inv_bottleneck_apply(bp, bs, x, stride=1, train=False)
                y = y.astype(jnp.bfloat16)
                return y, acc + jnp.sum(
                    lax.slice(y, (0,) * y.ndim, (1,) * y.ndim).astype(jnp.float32))

            dt = kloop(blk_body, xs, K=12, consts=(bp, bs))
            print(f"stage{si} inv_bottleneck @{hw} c{c} x{st.num_blocks}: "
                  f"{dt * 1e3:7.3f} ms/block -> {dt * st.num_blocks * 1e3:7.2f} ms total",
                  flush=True)
            cin = c

    # ---- train step ---------------------------------------------------------
    if args.train:
        from litepose_tpu.core.losses import LossConfig
        from litepose_tpu.train import optim
        from litepose_tpu.train.checkpoint import init_train_state
        from litepose_tpu.train.trainer import StepFns

        img = arch.img_size
        tx = optim.make_optimizer("adam", optim.multistep_lr(1e-3, [10**6], 0.1, 100))

        def train_apply(p, s, x):
            return apply_litepose(p, s, x, spec, arch, train=True)

        sfns = StepFns(train_apply, LossConfig(num_joints=14), tx,
                       base_input_size=img, base_output_sizes=[img // 4, img // 2])
        ts = init_train_state(params, state, tx.init(params))
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (B, img, img, 3)), jnp.uint8),
            "heatmaps": [jnp.asarray(rng.random((B, 14, img // 4, img // 4)), jnp.float32),
                         jnp.asarray(rng.random((B, 14, img // 2, img // 2)), jnp.float32)],
            "masks": [jnp.ones((B, img // 4, img // 4), jnp.float32),
                      jnp.ones((B, img // 2, img // 2), jnp.float32)],
            "joints": [jnp.zeros((B, 30, 14, 2), jnp.int32),
                       jnp.zeros((B, 30, 14, 2), jnp.int32)],
        }
        fn = sfns.get()
        ts, m = fn(ts, batch)
        jax.block_until_ready(m["total"])
        t1s, tKs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            ts, m = fn(ts, batch); jax.block_until_ready(m["total"])
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for _ in range(4):
                ts, m = fn(ts, batch)
            jax.block_until_ready(m["total"])
            tKs.append(time.perf_counter() - t0)
        dt = (float(np.median(tKs)) - float(np.median(t1s))) / 3
        report("train step (fwd+bwd+adam, donated)", dt)


if __name__ == "__main__":
    main()

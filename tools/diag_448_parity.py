"""Diagnose the 448/trained-weights parity divergence (VERDICT r4 #1).

Splits the end-to-end mismatch into its two candidate mechanisms:

  (a) DECODE: feed bit-identical heat/tag arrays (saved from the torch
      reference forward) through BOTH full decoders — our jitted
      parse_batch (exact top-k + JV Hungarian + adjust + refine +
      get_final_preds) and the reference HeatmapParser + get_final_preds —
      and match people.  Any divergence here is a pipeline bug.
  (b) FORWARD: quantify the torch-CPU vs XLA forward delta on trained
      weights at 448 (max abs/rel error, error at peak neighborhoods, tag
      channels), and cross-decode OUR heat/tag through the REFERENCE
      parser to show the composed-people flip tracks the forward noise,
      not the decoder.

Reference protocol: /root/reference/valid.py:195-245.

Run (same env as the test suite, XLA-CPU):
    JAX_PLATFORMS=cpu python tools/diag_448_parity.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

import numpy as np

from conftest import add_reference_to_path  # noqa: E402


def match_people(ref_results, our_results, tol=0.75):
    """The e2e test's person matcher: greedy by score, max-joint distance."""
    total, matched, tight, dists, surplus = 0, 0, 0, [], []
    used = set()
    r, o = ref_results, our_results
    for pr in sorted(r, key=lambda d: -d["score"]):
        total += 1
        kr = np.asarray(pr["keypoints"], np.float64).reshape(-1, 3)
        best, best_d = None, np.inf
        for j, po in enumerate(o):
            if j in used:
                continue
            ko = np.asarray(po["keypoints"], np.float64).reshape(-1, 3)
            d = float(np.max(np.abs(kr[:, :2] - ko[:, :2])))
            if d < best_d:
                best, best_d = j, d
        if best is not None and best_d <= tol:
            used.add(best)
            matched += 1
            tight += best_d <= 1e-2
            dists.append(best_d)
    surplus = [o[j]["score"] for j in range(len(o)) if j not in used]
    return total, matched, tight, dists, surplus


def main():
    add_reference_to_path()
    from test_group import _install_munkres_shim, _ref_parser
    _install_munkres_shim()

    import jax
    import torch

    from test_e2e_map_parity import NUM_JOINTS, _to_results
    from test_inference_pipeline import _RefPipeline
    from test_litepose_torch_parity import _make_ref_model
    from utils import transforms as ref_t  # reference module

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.engine import EngineConfig, PoseEngine
    from litepose_tpu.core.inference import InferenceFlags
    from litepose_tpu.data.affine import (get_affine_transform,
                                          get_multi_scale_size, warp_image)
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.data.synthetic import bench_scene_batch
    from litepose_tpu.models.layers import Policy
    from litepose_tpu.models.litepose import (ModelSpec, apply_litepose,
                                              init_litepose)
    from litepose_tpu.models.torch_convert import litepose_to_torch
    from litepose_tpu.ops.group_ref import GroupParams
    from litepose_tpu.train.checkpoint import load_params

    PROTO = 448
    ckpt = os.path.join(REPO, "assets", "bench_ckpt.msgpack")
    arch = get_arch("auto-S")
    spec = ModelSpec(num_joints=NUM_JOINTS)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    params, state = load_params(ckpt, params, state)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in litepose_to_torch(params, state, spec, arch).items()}
    ref_model = _make_ref_model(arch.to_dict(), num_joints=NUM_JOINTS)
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()

    def apply_fn(p, s, x):
        outs, _ = apply_litepose(p, s, x, spec, arch, train=False,
                                 policy=Policy.exact())
        return outs

    flags = InferenceFlags(
        num_joints=NUM_JOINTS,
        with_heatmaps_loss=(True, True), with_ae_loss=(True, False),
        test_with_heatmaps=(True, True), test_with_ae=(True, False),
        flip_test=True, flip_index=tuple(flip_index_for("crowd_pose_kpt")),
        project2image=True,
    )
    group = GroupParams(num_joints=NUM_JOINTS, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)
    engine = PoseEngine(
        apply_fn, params, state, flags, group,
        EngineConfig(input_size=PROTO, scale_factors=(1.0,),
                     project2image=True),
    )
    parser = _ref_parser(group)
    pipe = _RefPipeline(ref_model, NUM_JOINTS, flags.flip_index, PROTO, True)

    base = bench_scene_batch(8, 512, seed=101)
    scenes = [(i, base[i] if i % 2 == 0 else base[i][:448, :, :])
              for i in range(8)]

    agg = {k: [0, 0, 0, [], 0] for k in
           ("e2e", "decode_ref_arrays", "decode_our_arrays_refparser")}
    fwd_stats = []

    for iid, img in scenes:
        heat_r, tag_r, center, scale = pipe.heat_tag(img)  # NCHW numpy
        grouped, scores = parser.parse(
            torch.from_numpy(heat_r), torch.from_numpy(tag_r),
            adjust=True, refine=True)
        finals = ref_t.get_final_preds(
            grouped, center, scale, [heat_r.shape[3], heat_r.shape[2]])
        ref_res = _to_results(iid, finals, [float(s) for s in scores])

        # ---- our forward: same warped input, keep heat/tag --------------
        size_resized, c2, s2 = get_multi_scale_size(
            img.shape[:2], PROTO, 1.0, 1.0)
        mat = get_affine_transform(c2, s2, 0, size_resized)
        warped = warp_image(img, mat, size_resized)
        base_hw = (heat_r.shape[2], heat_r.shape[3])
        run = engine._infer_fn((warped.shape[0], warped.shape[1]),
                               base_hw, True)
        heat_o, tag_o = run(engine.params, engine.state, warped[None])
        heat_o = np.asarray(heat_o)   # NHWC (1,H,W,J)
        tag_o = np.asarray(tag_o)     # (1,H,W,J,T)
        heat_o_nchw = heat_o.transpose(0, 3, 1, 2)
        tag_o_nchw = tag_o.transpose(0, 3, 1, 2, 4)

        # forward delta stats
        d = np.abs(heat_o_nchw - heat_r)
        peak = heat_r > 0.5 * heat_r.max()
        dt = np.abs(tag_o_nchw - tag_r)
        fwd_stats.append((
            float(d.max()), float(d[peak].max() if peak.any() else 0.0),
            float(np.abs(heat_r).max()), float(dt.max()),
        ))

        # ---- (a) decode on REF arrays: ours vs reference ----------------
        dec = engine._decode_fn(base_hw)
        people, dscores, n = dec(
            np.ascontiguousarray(heat_r.transpose(0, 2, 3, 1)),
            np.ascontiguousarray(tag_r.transpose(0, 2, 3, 1, 4)))
        finals_a, scores_a = engine._finalize(people, dscores, n,
                                              center, scale, base_hw)
        ours_a = _to_results(iid, finals_a, scores_a)

        # ---- (b) REF parser on OUR arrays --------------------------------
        grouped_b, scores_b = parser.parse(
            torch.from_numpy(heat_o_nchw.copy()),
            torch.from_numpy(tag_o_nchw.copy()),
            adjust=True, refine=True)
        finals_b = ref_t.get_final_preds(
            grouped_b, center, scale, [heat_r.shape[3], heat_r.shape[2]])
        ref_on_ours = _to_results(iid, finals_b, [float(s) for s in scores_b])

        # ---- e2e: our full engine ----------------------------------------
        finals_e, scores_e = engine.process(img)
        ours_e = _to_results(iid, finals_e, scores_e)

        for key, ours in (("e2e", ours_e),
                          ("decode_ref_arrays", ours_a),
                          ("decode_our_arrays_refparser", ref_on_ours)):
            base_res = ref_res if key != "decode_our_arrays_refparser" else ours_e
            t, m, ti, ds, su = match_people(base_res, ours)
            a = agg[key]
            a[0] += t; a[1] += m; a[2] += ti; a[3] += ds; a[4] += len(su)

    print("\n=== forward delta (torch-CPU vs XLA, trained Auto-S @448) ===")
    dmax = max(s[0] for s in fwd_stats)
    dpeak = max(s[1] for s in fwd_stats)
    hmax = max(s[2] for s in fwd_stats)
    tmax = max(s[3] for s in fwd_stats)
    print(f"max |dheat| = {dmax:.3e} (at peaks {dpeak:.3e}); "
          f"|heat|max = {hmax:.3f}; max |dtag| = {tmax:.3e}")

    for key, label in (
        ("decode_ref_arrays",
         "(a) DECODE isolation: ref heat/tag -> our decoder vs ref parser"),
        ("decode_our_arrays_refparser",
         "(b) FORWARD isolation: our heat/tag -> ref parser vs our e2e"),
        ("e2e", "e2e (the failing gate): our engine vs ref pipeline"),
    ):
        t, m, ti, ds, su = agg[key]
        med = float(np.median(ds)) if ds else float("nan")
        print(f"{label}:\n   {m}/{t} matched ({ti} bit-tight, "
              f"median d={med:.4f} px, +{su} surplus)")


if __name__ == "__main__":
    main()

"""Direct end-to-end mAP parity: engine.process vs the reference pipeline.

Round-1 parity was transitive (stage parity -> pipeline parity -> decode
parity); this harness closes the loop in ONE test: on ~50 synthetic
multi-person scenes, (a) our PoseEngine (eval mode: exact Hungarian, exact
top-k, adjust+refine, flip test) and (b) the reference-composed pipeline
(torch model with identical weights + reference get_multi_stage_outputs /
aggregate_results / HeatmapParser / get_final_preds,
``/root/reference/valid.py:195-252``) produce final keypoints that match,
and identical AP through the same evaluator.

AP sensitivity trick: the GT fed to the evaluator is the REFERENCE
pipeline's own decode, so reference AP ~= 1.0 by construction and any
end-to-end divergence in our pipeline shows up as a visible AP drop.

Also quantifies the serving-mode approximations (greedy assignment,
approximate top-k) as AP deltas on the same scenes — replacing round 1's
"14/16 identical decodes" anecdote.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from conftest import add_reference_to_path

from test_eval_oracle import FakeGT
from test_group import _install_munkres_shim, _ref_parser
from test_inference_pipeline import _RefPipeline, _build_pair

from litepose_tpu.core.engine import EngineConfig, PoseEngine
from litepose_tpu.data.eval_oks import CROWDPOSE_SIGMAS, KeypointEvaluator
from litepose_tpu.ops.group_ref import GroupParams

NUM_JOINTS = 14
INPUT_SIZE = 192
N_SCENES = 50
# two source sizes -> two compile buckets (keeps the 1-CPU runtime sane)
SIZES = [(150, 210), (192, 160)]


def _scene(rng, hw):
    """Synthetic multi-person scene: blobby 'people' on textured noise, so
    the random-weight model produces structured (not flat) heatmaps."""
    h, w = hw
    img = rng.integers(40, 210, (h, w, 3)).astype(np.uint8)
    for _ in range(int(rng.integers(2, 5))):
        cx, cy = rng.uniform(20, w - 20), rng.uniform(20, h - 20)
        r = rng.uniform(8, 30)
        yy, xx = np.mgrid[0:h, 0:w]
        blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r**2))
        img = np.clip(
            img.astype(np.float32) + blob[..., None] * rng.uniform(-120, 120),
            0, 255,
        ).astype(np.uint8)
    return img


def _to_results(image_id, people, scores):
    out = []
    for person, sc in zip(people, scores):
        kp = np.zeros((NUM_JOINTS, 3), np.float64)
        kp[:, 0] = person[:, 0]
        kp[:, 1] = person[:, 1]
        kp[:, 2] = person[:, 2]
        out.append({
            "image_id": image_id,
            "keypoints": kp.reshape(-1).tolist(),
            "score": float(sc),
        })
    return out


def _gt_from_results(results_by_img):
    gts = {}
    for iid, results in results_by_img.items():
        anns = []
        for r in results:
            kp = np.asarray(r["keypoints"], np.float64).reshape(-1, 3)
            vis = (kp[:, 2] > 0).astype(np.float64) * 2
            g = np.stack([kp[:, 0], kp[:, 1], vis], 1)
            xs, ys = kp[:, 0], kp[:, 1]
            w, h = xs.max() - xs.min(), ys.max() - ys.min()
            anns.append({
                "keypoints": g.reshape(-1).tolist(),
                "area": float(max(w * h, 1.0)),
                "bbox": [float(xs.min()), float(ys.min()), float(w), float(h)],
                "iscrowd": 0,
                "num_keypoints": int((vis > 0).sum()),
            })
        gts[iid] = anns
    return gts


@pytest.fixture(scope="module")
def harness():
    add_reference_to_path()
    _install_munkres_shim()
    import torch

    ref_model, engine, flags = _build_pair(
        arch_name="search-XS", input_size=INPUT_SIZE, num_joints=NUM_JOINTS
    )
    group = GroupParams(num_joints=NUM_JOINTS, detection_threshold=0.1,
                        nms_kernel=5, nms_padding=2)
    parser = _ref_parser(group)
    pipe = _RefPipeline(ref_model, NUM_JOINTS, flags.flip_index, INPUT_SIZE, True)

    rng = np.random.default_rng(7)
    scenes = [
        (i, _scene(rng, SIZES[i % len(SIZES)])) for i in range(N_SCENES)
    ]

    from utils import transforms as ref_t  # reference module

    ref_results = {}
    for iid, img in scenes:
        heat, tag, center, scale = pipe.heat_tag(img)
        grouped, scores = parser.parse(
            torch.from_numpy(heat), torch.from_numpy(tag),
            adjust=True, refine=True,
        )
        finals = ref_t.get_final_preds(
            grouped, center, scale, [heat.shape[3], heat.shape[2]]
        )
        ref_results[iid] = _to_results(iid, finals, [float(s) for s in scores])

    gt = FakeGT(_gt_from_results(ref_results))
    return engine, group, scenes, ref_results, gt, pipe, parser


def _unpack(harness):
    return harness[:5]


def _run_engine(engine, scenes):
    results = {}
    for iid, img in scenes:
        finals, scores = engine.process(img)
        results[iid] = _to_results(iid, finals, scores)
    return results


def _ap(gt, results_by_img):
    ev = KeypointEvaluator(gt, style="coco", sigmas=CROWDPOSE_SIGMAS)
    flat = [r for rs in results_by_img.values() for r in rs]
    return ev.evaluate(flat)["AP"]


def test_eval_mode_matches_reference_keypoints_and_ap(harness):
    engine, group, scenes, ref_results, gt = _unpack(harness)
    ours = _run_engine(engine, scenes)

    total, mismatched = 0, 0
    for iid, _ in scenes:
        r, o = ref_results[iid], ours[iid]
        assert len(r) == len(o), f"img {iid}: {len(o)} people vs ref {len(r)}"
        for pr, po in zip(
            sorted(r, key=lambda d: -d["score"]),
            sorted(o, key=lambda d: -d["score"]),
        ):
            total += 1
            if not np.allclose(pr["keypoints"], po["keypoints"], atol=1e-2):
                mismatched += 1
    # near-threshold fp32 ties may flip the rare decode; demand >= 95% exact
    assert total > 20, "degenerate harness: almost nothing decoded"
    frac = mismatched / total
    print(f"\ne2e keypoint agreement: {total - mismatched}/{total} people")
    assert frac <= 0.05, f"{mismatched}/{total} people diverge from reference"

    ap_ref = _ap(gt, ref_results)
    ap_ours = _ap(gt, ours)
    print(f"AP ref-pipeline={ap_ref:.4f} ours={ap_ours:.4f}")
    # self-AP is high but not 1.0: decodes whose joints all score <= 0
    # become ignored GTs (num_keypoints == 0) while their detections still
    # count as FPs.  Measured 0.66 on these random-weight scenes.
    assert ap_ref > 0.5
    assert abs(ap_ours - ap_ref) <= 0.005


def test_serving_approximations_quantified(harness):
    """AP deltas for the serving-mode shortcuts, measured not anecdotal."""
    engine, group, scenes, ref_results, gt = _unpack(harness)
    ap_ref = _ap(gt, ref_results)

    def variant(assignment, topk):
        e = PoseEngine(
            engine.apply_fn, engine.params, engine.state, engine.flags, group,
            EngineConfig(input_size=INPUT_SIZE, scale_factors=(1.0,),
                         project2image=True, assignment=assignment,
                         topk_method=topk),
        )
        return _ap(gt, _run_engine(e, scenes))

    ap_greedy = variant("greedy", "exact")
    ap_approx = variant("hungarian", "approx")
    print(f"\nAP exact={ap_ref:.4f} greedy={ap_greedy:.4f} "
          f"(d={ap_greedy - ap_ref:+.4f}) approx-topk={ap_approx:.4f} "
          f"(d={ap_approx - ap_ref:+.4f})")
    # serving shortcuts must stay within a small, *measured* envelope
    assert ap_greedy >= ap_ref - 0.05
    assert ap_approx >= ap_ref - 0.05


PROTOCOL_SIZE = 448  # Auto-S eval resolution (/root/reference/valid.py:104-111)
N_PROTO_SCENES = 8


def test_protocol_resolution_trained_ckpt():
    """End-to-end parity at the ACTUAL protocol resolution (448, Auto-S)
    with TRAINED weights — not the 192/random-weight proxy above.

    The trained bench checkpoint (assets/bench_ckpt.msgpack) is converted
    to a reference-layout torch state_dict (``litepose_to_torch``) and
    loaded strict=True into the reference model; both pipelines then decode
    the same multi-person scenes with real peaked heatmaps at the
    mobile.yaml protocol (flip test + project2image + adjust/refine,
    /root/reference/valid.py:195-245)."""
    import os

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "bench_ckpt.msgpack")
    if not os.path.isfile(ckpt):
        pytest.skip("trained bench checkpoint not present")

    add_reference_to_path()
    _install_munkres_shim()
    import jax
    import torch

    from test_litepose_torch_parity import _make_ref_model

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.core.inference import InferenceFlags
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.data.synthetic import bench_scene_batch
    from litepose_tpu.models.layers import Policy
    from litepose_tpu.models.litepose import (ModelSpec, apply_litepose,
                                              init_litepose)
    from litepose_tpu.models.torch_convert import litepose_to_torch
    from litepose_tpu.train.checkpoint import load_params
    from utils import transforms as ref_t  # reference module

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
        EngineConfig(input_size=PROTOCOL_SIZE, scale_factors=(1.0,),
                     project2image=True),
    )
    parser = _ref_parser(group)
    pipe = _RefPipeline(ref_model, NUM_JOINTS, flags.flip_index,
                        PROTOCOL_SIZE, True)

    # trained-distribution scenes at two source sizes (square + cropped)
    base = bench_scene_batch(N_PROTO_SCENES, 512, seed=101)
    scenes = []
    for i in range(N_PROTO_SCENES):
        img = base[i] if i % 2 == 0 else base[i][:448, :, :]
        scenes.append((i, img))

    ref_results = {}
    for iid, img in scenes:
        heat, tag, center, scale = pipe.heat_tag(img)
        grouped, scores = parser.parse(
            torch.from_numpy(heat), torch.from_numpy(tag),
            adjust=True, refine=True,
        )
        finals = ref_t.get_final_preds(
            grouped, center, scale, [heat.shape[3], heat.shape[2]]
        )
        ref_results[iid] = _to_results(iid, finals, [float(s) for s in scores])

    ours = _run_engine(engine, scenes)

    # Cross-backend fp limits of this comparison (measured, round 4):
    # torch-CPU and XLA-CPU convs differ at ~1e-4 relative (gemm blocking
    # reassociation), which on sharp trained peaks (a) flips quarter-pixel
    # adjust comparisons — a ±0.5 px keypoint shift — and (b) flips whether
    # a near-0.1-threshold WEAK person exists at all.  Neither is a
    # pipeline divergence, so people are matched by sub-pixel keypoint
    # proximity (0.75 px) rather than strict equality, surplus people must
    # be weak, and metric-level parity is pinned through AP.
    total, matched, tight, dists, surplus = 0, 0, 0, [], []
    for iid, _ in scenes:
        r, o = ref_results[iid], ours[iid]
        used = set()
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
            if best is not None and best_d <= 0.75:
                used.add(best)
                matched += 1
                tight += best_d <= 1e-2
                dists.append(best_d)
        surplus += [o[j]["score"] for j in range(len(o)) if j not in used]
    assert total >= N_PROTO_SCENES, "degenerate harness: almost nothing decoded"
    print(f"\n448 trained-ckpt person agreement: {matched}/{total} "
          f"({tight} bit-tight, median d={np.median(dists):.4f} px, "
          f"+{len(surplus)} surplus)")
    assert matched / total >= 0.95, \
        f"only {matched}/{total} people match the reference at 448"
    assert len(surplus) <= max(1, total // 10), f"surplus people: {surplus}"
    assert all(s < 0.2 for s in surplus), \
        f"surplus people must be weak near-threshold decodes: {surplus}"

    gt = FakeGT(_gt_from_results(ref_results))
    ap_ref = _ap(gt, ref_results)
    ap_ours = _ap(gt, ours)
    print(f"448 trained-ckpt AP ref-pipeline={ap_ref:.4f} ours={ap_ours:.4f}")
    assert ap_ref > 0.5
    assert abs(ap_ours - ap_ref) <= 0.01


MS_SCALES = (0.5, 1.0, 2.0)
N_MS_SCENES = 10


def test_multi_scale_matches_reference_keypoints_and_ap(harness):
    """Multi-scale (0.5, 1.0, 2.0) end-to-end parity vs the
    reference-composed multi-scale pipeline (/root/reference/valid.py:207-225
    + lib/core/inference.py:176-208): keypoints match per person and AP is
    identical through the same evaluator."""
    import torch

    from utils import transforms as ref_t  # reference module

    engine, group, scenes, _, _, pipe, parser = harness
    sub = scenes[:N_MS_SCENES]

    ref_results = {}
    for iid, img in sub:
        heat, tag, center, scale = pipe.heat_tag_multi(img, list(MS_SCALES))
        grouped, rscores = parser.parse(
            torch.from_numpy(heat), torch.from_numpy(tag),
            adjust=True, refine=True,
        )
        finals = ref_t.get_final_preds(
            grouped, center, scale, [heat.shape[3], heat.shape[2]]
        )
        ref_results[iid] = _to_results(iid, finals, [float(s) for s in rscores])

    ms_engine = PoseEngine(
        engine.apply_fn, engine.params, engine.state, engine.flags, group,
        EngineConfig(input_size=INPUT_SIZE, scale_factors=MS_SCALES,
                     project2image=True),
    )
    ours = _run_engine(ms_engine, sub)

    total, mismatched = 0, 0
    for iid, _ in sub:
        r, o = ref_results[iid], ours[iid]
        assert len(r) == len(o), f"img {iid}: {len(o)} people vs ref {len(r)}"
        for pr, po in zip(
            sorted(r, key=lambda d: -d["score"]),
            sorted(o, key=lambda d: -d["score"]),
        ):
            total += 1
            if not np.allclose(pr["keypoints"], po["keypoints"], atol=1e-2):
                mismatched += 1
    assert total > 5, "degenerate multi-scale harness"
    print(f"\nmulti-scale keypoint agreement: {total - mismatched}/{total}")
    assert mismatched / total <= 0.05, f"{mismatched}/{total} people diverge"

    gt = FakeGT(_gt_from_results(ref_results))
    ap_ref = _ap(gt, ref_results)
    ap_ours = _ap(gt, ours)
    print(f"multi-scale AP ref-pipeline={ap_ref:.4f} ours={ap_ours:.4f}")
    assert ap_ref > 0.5
    assert abs(ap_ours - ap_ref) <= 0.005

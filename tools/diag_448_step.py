"""Find the FIRST divergent grouping step: oracle vs reference parser.

Monkeypatches the reference's py_max_match to record each assignment step
(cost matrix + chosen pairs) for scene 0..7, replays our numpy oracle with
the same instrumentation, and reports where (and why) the trajectories
split: top-k peak order, matrix contents, or the assignment choice.

Run:  JAX_PLATFORMS=cpu python tools/diag_448_step.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

import numpy as np

from conftest import add_reference_to_path

CACHE = "/tmp/diag448_arrays.npz"


def main():
    add_reference_to_path()
    from test_group import _install_munkres_shim, _ref_parser
    _install_munkres_shim()
    import torch

    from litepose_tpu.ops import group_ref
    from litepose_tpu.ops.group_ref import GroupParams

    if not os.path.isfile(CACHE):
        print("run tools/diag_448_stage.py first (builds the array cache)")
        return

    data = np.load(CACHE)
    p = GroupParams(num_joints=14, detection_threshold=0.1,
                    nms_kernel=5, nms_padding=2)
    parser = _ref_parser(p)

    from core import group as ref_group  # reference module

    for i in range(8):
        heat, tag = data[f"heat{i}"], data[f"tag{i}"]

        # --- record the reference trajectory --------------------------------
        ref_steps = []
        orig = ref_group.py_max_match

        def recording(scores, _steps=ref_steps, _orig=orig):
            pairs = _orig(scores)
            _steps.append((np.array(scores, np.float64).copy(),
                           np.array(pairs).copy(),
                           np.asarray(scores).dtype))
            return pairs

        ref_group.py_max_match = recording
        # top-k as the reference computes it (torch maxpool + topk)
        rk = parser.top_k(torch.from_numpy(heat), torch.from_numpy(tag))
        ref_tag_k = np.asarray(rk["tag_k"][0])
        ref_loc_k = np.asarray(rk["loc_k"][0])
        ref_val_k = np.asarray(rk["val_k"][0])
        ra, _ = parser.parse(torch.from_numpy(heat), torch.from_numpy(tag),
                             adjust=False, refine=False)
        ref_group.py_max_match = orig
        ref_people = np.asarray(ra[0])

        # --- our top-k -------------------------------------------------------
        tag_k, loc_k, val_k = group_ref.top_k_np(heat[0], tag[0], p)
        tk = "OK" if (np.allclose(tag_k, ref_tag_k) and
                      np.allclose(loc_k, ref_loc_k) and
                      np.allclose(val_k, ref_val_k)) else "DIFF"
        if tk == "DIFF":
            # localize: which joints / ranks
            bad = []
            for k in range(14):
                if not (np.allclose(loc_k[k], ref_loc_k[k])
                        and np.allclose(val_k[k], ref_val_k[k])):
                    r = np.where(~np.isclose(val_k[k], ref_val_k[k]) |
                                 ~np.isclose(loc_k[k], ref_loc_k[k]).all(-1))
                    bad.append((k, r[0][:4].tolist()))
            print(f"scene {i}: TOPK DIFF at (joint, ranks) {bad[:6]}")

        # --- replay the oracle, recording steps ------------------------------
        our_steps = []
        from scipy.optimize import linear_sum_assignment

        cluster_joints, cluster_tags = [], []
        default = np.zeros((p.num_joints, 3 + tag_k.shape[2]), np.float32)
        first_div = None
        for ji, idx in enumerate(p.joint_order):
            tags = tag_k[idx]
            joints = np.concatenate(
                [loc_k[idx], val_k[idx, :, None], tags], axis=1)
            mask = joints[:, 2] > p.detection_threshold
            tags, joints = tags[mask], joints[mask]
            if joints.shape[0] == 0:
                continue
            if ji == 0 or not cluster_joints:
                for t, j in zip(tags, joints):
                    cluster_joints.append(default.copy())
                    cluster_joints[-1][idx] = j
                    cluster_tags.append([t])
                continue
            grouped_tags = np.array(
                [np.mean(ts, axis=0)
                 for ts in cluster_tags[: p.max_num_people]])
            diff = np.linalg.norm(
                joints[:, None, 3:] - grouped_tags[None], ord=2, axis=2)
            diff_saved = diff.copy()
            diff = np.round(diff) * 100 - joints[:, 2:3]
            nr_, nc_ = diff.shape
            if nr_ > nc_:
                diff = np.concatenate(
                    [diff, np.full((nr_, nr_ - nc_), 1e10)], axis=1)
            si = len(our_steps)
            our_steps.append(diff)
            if si < len(ref_steps):
                rmat, rpairs, rdt = ref_steps[si]
                if rmat.shape != diff.shape or not np.allclose(rmat, diff):
                    if first_div is None:
                        first_div = (ji, idx, "matrix",
                                     rmat.shape, diff.shape)
            else:
                if first_div is None:
                    first_div = (ji, idx, "extra-step", None, None)
            # shim assignment (= what the test's reference uses)
            n = max(diff.shape)
            sq = np.zeros((n, n))
            sq[: diff.shape[0], : diff.shape[1]] = diff
            r1, c1 = linear_sum_assignment(sq)
            pairs = sorted((r, c) for r, c in zip(r1, c1)
                           if r < diff.shape[0] and c < diff.shape[1])
            if si < len(ref_steps) and first_div is None:
                rmat, rp, rdt = ref_steps[si]
                rpairs = [tuple(x) for x in rp.tolist()]
                if pairs != rpairs:
                    bitwise = (rmat.shape == diff.shape
                               and np.array_equal(rmat,
                                                  diff.astype(np.float64)))
                    cost_ref = sum(diff[r, c] for r, c in rpairs
                                   if r < nr_ and c < diff.shape[1])
                    cost_ours = sum(diff[r, c] for r, c in pairs
                                    if r < nr_ and c < diff.shape[1])
                    ent = ""
                    if rmat.shape == diff.shape:
                        bad = np.argwhere(rmat != diff.astype(np.float64))
                        if len(bad):
                            r, c = bad[0]
                            ent = (f" e.g. [{r},{c}] ref={rmat[r, c]!r} "
                                   f"ours={float(diff[r, c])!r}")
                    first_div = (ji, idx, "pairs",
                                 f"ref_dtype={rdt} ours={diff.dtype}",
                                 f"bitwise={bitwise}",
                                 f"cost ref={cost_ref:.6f} "
                                 f"ours={cost_ours:.6f}{ent}")
            for row, col in pairs:
                if row < nr_ and col < nc_ \
                        and diff_saved[row, col] < p.tag_threshold:
                    cluster_joints[col][idx] = joints[row]
                    cluster_tags[col].append(tags[row])
                else:
                    cluster_joints.append(default.copy())
                    cluster_joints[-1][idx] = joints[row]
                    cluster_tags.append([tags[row]])

        n_match = 0
        used = set()
        for pa in ref_people:
            for j, pb in enumerate(cluster_joints):
                if j not in used and np.allclose(
                        pa[:, :2], pb[:, :2], atol=1e-4):
                    used.add(j)
                    n_match += 1
                    break
        print(f"scene {i}: topk={tk} ref_steps={len(ref_steps)} "
              f"our_steps={len(our_steps)} first_div={first_div} "
              f"people ref={len(ref_people)} ours={len(cluster_joints)} "
              f"matched={n_match}")


if __name__ == "__main__":
    main()

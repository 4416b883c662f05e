"""Stage-level bisection of the 448 decode divergence (VERDICT r4 #1).

diag_448_parity.py established: the torch-CPU vs XLA forward delta is ~1e-6
and our decoder reproduces the 67/113 mismatch on the REFERENCE's own
heat/tag arrays — the divergence is inside the decode.  This tool bisects
it: on the saved arrays, compare (ref parser | numpy oracle | jit decode)
at each stage (group-only, +adjust, +adjust+refine) and quantify
assignment-tie degeneracy in the match_by_tag cost matrices.

Run:  JAX_PLATFORMS=cpu python tools/diag_448_stage.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

import numpy as np

from conftest import add_reference_to_path  # noqa: E402

CACHE = "/tmp/diag448_arrays.npz"


def build_arrays():
    """Save the 8 scenes' reference heat/tag (torch pipeline) once."""
    add_reference_to_path()
    from test_group import _install_munkres_shim
    _install_munkres_shim()
    import jax
    import torch

    from test_e2e_map_parity import NUM_JOINTS
    from test_inference_pipeline import _RefPipeline
    from test_litepose_torch_parity import _make_ref_model

    from litepose_tpu.arch.zoo import get_arch
    from litepose_tpu.data.flip import flip_index_for
    from litepose_tpu.data.synthetic import bench_scene_batch
    from litepose_tpu.models.litepose import ModelSpec, init_litepose
    from litepose_tpu.models.torch_convert import litepose_to_torch
    from litepose_tpu.train.checkpoint import load_params

    arch = get_arch("auto-S")
    spec = ModelSpec(num_joints=NUM_JOINTS)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    params, state = load_params(
        os.path.join(REPO, "assets", "bench_ckpt.msgpack"), params, state)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in litepose_to_torch(params, state, spec, arch).items()}
    ref_model = _make_ref_model(arch.to_dict(), num_joints=NUM_JOINTS)
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()
    pipe = _RefPipeline(ref_model, NUM_JOINTS,
                        tuple(flip_index_for("crowd_pose_kpt")), 448, True)
    base = bench_scene_batch(8, 512, seed=101)
    out = {}
    for i in range(8):
        img = base[i] if i % 2 == 0 else base[i][:448, :, :]
        heat, tag, center, scale = pipe.heat_tag(img)
        out[f"heat{i}"] = heat
        out[f"tag{i}"] = tag
        out[f"center{i}"] = np.asarray(center)
        out[f"scale{i}"] = np.asarray(scale)
    np.savez(CACHE, **out)
    print(f"saved {CACHE}")


def people_match(a, b, tol=1e-4):
    """Greedy match people by keypoint proximity; returns (nA, nB, matched)."""
    used = set()
    matched = 0
    for pa in a:
        best, best_d = None, np.inf
        for j, pb in enumerate(b):
            if j in used:
                continue
            d = float(np.max(np.abs(pa[:, :2] - pb[:, :2])))
            if d < best_d:
                best, best_d = j, d
        if best is not None and best_d <= tol:
            used.add(best)
            matched += 1
    return len(a), len(b), matched


def main():
    if not os.path.isfile(CACHE):
        build_arrays()
    data = np.load(CACHE)

    add_reference_to_path()
    from test_group import _install_munkres_shim, _ref_parser
    _install_munkres_shim()
    import torch

    from litepose_tpu.ops import group_ref
    from litepose_tpu.ops.group import StaticGroupCfg, parse_batch
    from litepose_tpu.ops.group_ref import GroupParams

    p = GroupParams(num_joints=14, detection_threshold=0.1,
                    nms_kernel=5, nms_padding=2)
    parser = _ref_parser(p)
    gcfg = StaticGroupCfg.from_params(p)

    stages = [("group", False, False), ("group+adjust", True, False),
              ("full", True, True)]
    for label, adj, ref_ in stages:
        tot_r = tot_o = tot_j = m_o = m_j = 0
        for i in range(8):
            heat, tag = data[f"heat{i}"], data[f"tag{i}"]
            ra, _ = parser.parse(torch.from_numpy(heat),
                                 torch.from_numpy(tag),
                                 adjust=adj, refine=ref_)
            ref_people = np.asarray(ra[0])
            op, _ = group_ref.parse_np(heat[0], tag[0], p,
                                       adjust=adj, refine=ref_)
            jp, js, jn = parse_batch(
                np.transpose(heat, (0, 1, 2, 3)), tag, gcfg, adj, ref_)
            jp = np.asarray(jp[0])[: int(jn[0])]
            nr, no, mo = people_match(ref_people, op)
            _, nj, mj = people_match(ref_people, jp)
            tot_r += nr; tot_o += no; tot_j += nj; m_o += mo; m_j += mj
        print(f"[{label:13s}] ref={tot_r:4d}  oracle={tot_o:4d} "
              f"(match {m_o:4d})  jit={tot_j:4d} (match {m_j:4d})")

    # ---- tie-degeneracy census in match_by_tag ---------------------------
    print("\nassignment-step degeneracy census (scene 0..7):")
    from scipy.optimize import linear_sum_assignment

    n_steps = n_tied = n_diverge = 0
    for i in range(8):
        heat, tag = data[f"heat{i}"], data[f"tag{i}"]
        tag_k, loc_k, val_k = group_ref.top_k_np(heat[0], tag[0], p)

        # replay match_by_tag, checking each step's assignment uniqueness
        cluster_joints, cluster_tags = [], []
        default = np.zeros((p.num_joints, 3 + tag_k.shape[2]), np.float32)
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
            grouped = cluster_joints[: p.max_num_people]
            grouped_tags = np.array(
                [np.mean(ts, axis=0) for ts in cluster_tags[: p.max_num_people]])
            diff = np.linalg.norm(
                joints[:, None, 3:] - grouped_tags[None], ord=2, axis=2)
            diff_saved = diff.copy()
            diff = np.round(diff) * 100 - joints[:, 2:3]
            nr_, nc_ = diff.shape
            if nr_ > nc_:
                diff = np.concatenate(
                    [diff, np.full((nr_, nr_ - nc_), 1e10)], axis=1)
            n_steps += 1
            # shim semantics: float64 square zero-padded
            n = max(diff.shape)
            sq = np.zeros((n, n))
            sq[: diff.shape[0], : diff.shape[1]] = diff
            r1, c1 = linear_sum_assignment(sq)
            # same cost matrix, reversed row order: any tie lets the
            # optimum move
            r2, c2 = linear_sum_assignment(sq[::-1])
            c2 = c2[np.argsort((n - 1) - r2)]
            sol1 = c1[np.argsort(r1)][: nr_]
            if not np.array_equal(sol1, c2[:nr_]):
                n_tied += 1
            # does the fp32-rect oracle solver agree with the shim?
            r3, c3 = linear_sum_assignment(diff)
            if not np.array_equal(sol1[: nr_], c3[np.argsort(r3)][: nr_]):
                n_diverge += 1
            # apply shim assignment to keep the replay on the ref trajectory
            for row, col in zip(r1.tolist(), c1.tolist()):
                if row < nr_ and col < diff_saved.shape[1] \
                        and diff_saved[row, col] < p.tag_threshold:
                    cluster_joints[col][idx] = joints[row]
                    cluster_tags[col].append(tags[row])
                elif row < nr_:
                    cluster_joints.append(default.copy())
                    cluster_joints[-1][idx] = joints[row]
                    cluster_tags.append([tags[row]])
    print(f"steps={n_steps}  degenerate(optimum moved under row-reversal)="
          f"{n_tied}  fp32-rect-solver-diverged={n_diverge}")


if __name__ == "__main__":
    main()

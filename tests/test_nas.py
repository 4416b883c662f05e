"""NAS stack tests: evolution, efficiency predictor, BN calibration, fold."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from litepose_tpu.arch.manager import ArchManager
from litepose_tpu.arch.zoo import get_arch
from litepose_tpu.nas.calibrate import calibrate_bn
from litepose_tpu.nas.evolution import EvolutionFinder
from litepose_tpu.nas.predictors import EfficiencyPredictor


def test_efficiency_predictor_is_pure_math():
    eff = EfficiencyPredictor(num_joints=14)
    assert abs(eff(get_arch("search-S")) - 5.0) < 0.15
    assert abs(eff(get_arch("search-XS")) - 1.2) < 0.1


def test_evolution_respects_constraint_and_improves():
    manager = ArchManager(seed=0)
    eff = EfficiencyPredictor(num_joints=14)

    # synthetic accuracy: favors wider + higher-res archs (monotone in MACs)
    def acc(arch):
        g = eff(arch)
        return g / (1.0 + g)

    finder = EvolutionFinder(
        eff, acc, manager, population_size=12, max_time_budget=6, seed=0
    )
    best_acc, best_arch, history = finder.run_evolution_search(constraint=6.0)
    assert eff(best_arch) <= 6.0
    assert history == sorted(history)  # monotone best-so-far
    # with a monotone objective the search should push close to the budget
    assert eff(best_arch) > 3.0


def test_evolution_mutation_stays_in_space():
    manager = ArchManager(seed=1)
    eff = EfficiencyPredictor(num_joints=14)
    finder = EvolutionFinder(eff, lambda a: 0.0, manager, seed=1)
    base, _ = finder.random_valid_sample(8.0)
    for _ in range(5):
        child, g = finder.mutate_sample(base, 8.0)
        assert g <= 8.0
        assert child.img_size in manager.img_sizes
        for st, (c, n, s) in zip(child.backbone_setting, manager.stage_setting):
            assert st.channel in manager.channel_choices(c)
            assert st.num_blocks == n


def test_calibrate_bn_average_recovers_stats():
    """Calibration on constant-statistics data recovers those statistics."""
    from litepose_tpu.models.layers import batch_norm, bn_init

    p, s = bn_init(4)
    rng = np.random.default_rng(0)
    true_mean = np.array([1.0, -2.0, 0.5, 3.0], np.float32)
    true_std = np.array([2.0, 0.5, 1.0, 1.5], np.float32)

    def apply_train(params, state, x):
        return batch_norm(p, state, x, train=True)

    batches = [
        (rng.standard_normal((8, 6, 6, 4)).astype(np.float32) * true_std + true_mean)
        for _ in range(20)
    ]
    state = calibrate_bn(apply_train, p, s, batches, mode="average")
    np.testing.assert_allclose(np.asarray(state["mean"]), true_mean, atol=0.15)
    np.testing.assert_allclose(
        np.asarray(state["var"]), true_std**2, rtol=0.15
    )


def test_fold_bn_preserves_outputs():
    from litepose_tpu.models.fold_bn import fold_litepose_bn
    from litepose_tpu.models.layers import Policy
    from litepose_tpu.models.litepose import ModelSpec, apply_litepose, init_litepose

    arch = ArchManager().fixed_sample(reso=64, ratio=0.25)
    spec = ModelSpec(num_joints=14)
    params, state = init_litepose(jax.random.PRNGKey(0), spec, arch)
    # non-trivial BN stats
    rng = np.random.default_rng(0)
    state = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x) + rng.uniform(0.05, 0.3, np.shape(x)).astype(np.float32)),
        state,
    )
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    fwd = jax.jit(lambda p, s, x: apply_litepose(
        p, s, x, spec, arch, policy=Policy.exact()))
    outs_a, _ = fwd(params, state, x)
    fp, fs = fold_litepose_bn(params, state)
    outs_b, _ = fwd(fp, fs, x)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)
    # fold really removed the normalization (identity stats)
    assert float(jnp.abs(fs["first"]["bn2"]["mean"]).max()) == 0.0


def test_gen_arch_tool(tmp_path):
    import json
    import subprocess
    import sys

    out = tmp_path / "manual-S.json"
    r = subprocess.run(
        [sys.executable, "tools/gen_arch.py", "--reso", "256", "--ratio", "0.5",
         "--out", str(out)],
        capture_output=True, text=True, cwd=".",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    d = json.load(open(out))
    assert d["img_size"] == 256 and d["input_channel"] == 16


@pytest.mark.slow
def test_accuracy_predictor_end_to_end(tmp_path):
    """AccuracyPredictor: extract candidate -> BN recalibration -> batched
    fused eval -> AP, with memoization.  Covers the acc_pred.py +
    calibrate_test.py semantics (/root/reference/arch_search/acc_pred.py)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixture_data import make_fixture

    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.data.dataset import PoseDataset
    from litepose_tpu.models.litepose import ModelSpec
    from litepose_tpu.models.super_litepose import SuperDims, init_super_litepose
    from litepose_tpu.nas.predictors import AccuracyPredictor

    ann, img_dir = make_fixture(str(tmp_path / "fix"), num_joints=14, n_images=4)
    ds = PoseDataset(ann, img_dir, 14, style="crowdpose", filter_for_train=False)

    cfg = default_config()
    update_config(
        cfg,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     "configs/crowd_pose/mobilenet/supermobile.yaml"),
        ["TEST.FLIP_TEST", "False"],
    )

    manager = ArchManager(seed=0)
    dims = SuperDims.from_manager(manager)
    spec = ModelSpec(num_joints=14)
    params, state = init_super_litepose(jax.random.PRNGKey(0), spec, dims)

    pred = AccuracyPredictor(
        params, state, dims, spec, ds, ds, cfg,
        n_calib_batches=1, calib_batch_size=2, max_eval_images=2,
    )
    arch = manager.fixed_sample(reso=64, ratio=0.25)
    acc = pred(arch)
    assert isinstance(acc, float) and 0.0 <= acc <= 1.0
    assert pred(arch) == acc  # memoized (no recompute)


@pytest.mark.slow
def test_masked_scoring_matches_extract(tmp_path):
    """scoring="masked" (desc-traced, one compiled program family per
    resolution) must agree with scoring="extract" (reference semantics:
    per-candidate subnet extraction): equal calibrated BN statistics on the
    active channel slice at exact precision, AP within the bf16 noise class
    at the production policy (the masked graph contracts over max widths,
    the extracted graph over subnet widths — XLA tiles them differently, so
    under bf16 compute the two legally round differently; at
    Policy.exact() they agree to reassociation noise), and no per-candidate
    engine rebuild across width mutations."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixture_data import make_fixture

    from litepose_tpu.config import default_config, update_config
    from litepose_tpu.core.inference import normalize_images
    from litepose_tpu.data.dataset import PoseDataset
    from litepose_tpu.models.litepose import (ModelSpec, apply_litepose,
                                              init_litepose)
    from litepose_tpu.models.super_litepose import (SuperDims,
                                                    apply_super_litepose,
                                                    arch_to_mask_desc,
                                                    extract_subnet,
                                                    init_super_litepose)
    from litepose_tpu.nas.predictors import AccuracyPredictor

    ann, img_dir = make_fixture(str(tmp_path / "fix"), num_joints=14, n_images=4)
    ds = PoseDataset(ann, img_dir, 14, style="crowdpose", filter_for_train=False)

    cfg = default_config()
    update_config(
        cfg,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     "configs/crowd_pose/mobilenet/supermobile.yaml"),
        ["TEST.FLIP_TEST", "False"],
    )

    manager = ArchManager(seed=0)
    dims = SuperDims.from_manager(manager)
    spec = ModelSpec(num_joints=14)
    sp, ss = init_super_litepose(jax.random.PRNGKey(0), spec, dims)
    arch = manager.fixed_sample(reso=64, ratio=0.5)

    # --- calibrated BN stats agree on the active slice -------------------
    rng = np.random.default_rng(3)
    batches = [rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
               for _ in range(2)]

    from litepose_tpu.models.layers import Policy

    EXACT = Policy.exact()
    p_sub, s_sub = extract_subnet(sp, ss, arch, dims, spec)

    def train_sub(p, s, u8):
        return apply_litepose(p, s, normalize_images(u8), spec, arch,
                              train=True, policy=EXACT)

    s_e = calibrate_bn(jax.jit(train_sub), p_sub, s_sub, batches)

    desc = arch_to_mask_desc(arch, manager)

    def train_masked(p, s, u8):
        return apply_super_litepose(p["net"], s, normalize_images(u8),
                                    p["desc"], spec, dims, train=True,
                                    policy=EXACT)

    s_m_full = calibrate_bn(jax.jit(train_masked), {"net": sp, "desc": desc},
                            ss, batches)
    _, s_m = extract_subnet(sp, s_m_full, arch, dims, spec)
    # atol: calibrate_bn's delta recovery ((new - 0.9 old)/0.1) amplifies
    # the cross-graph reassociation noise 10x
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3, rtol=1e-2),
        s_e, s_m)

    # --- predictor end to end: same AP, engines shared across widths ------
    kw = dict(n_calib_batches=1, calib_batch_size=2, max_eval_images=2)
    acc_e = AccuracyPredictor(sp, ss, dims, spec, ds, ds, cfg,
                              scoring="extract", **kw)
    acc_m = AccuracyPredictor(sp, ss, dims, spec, ds, ds, cfg,
                              scoring="masked", **kw)
    a_e, a_m = acc_e(arch), acc_m(arch)
    assert a_m == pytest.approx(a_e, abs=0.05)  # bf16 noise class

    arch2 = manager.fixed_sample(reso=64, ratio=0.25)  # width mutation
    acc_m(arch2)
    assert len(acc_m._masked_engines) == 1  # same compiled family reused

"""Efficiency and accuracy predictors for the evolutionary search.

EfficiencyPredictor: pure-math MAC count over the arch descriptor — the
reference instantiates the candidate as a real torch model and runs ptflops
(``/root/reference/arch_search/eff_pred.py:13-19``); ours is instant.

AccuracyPredictor: extract the candidate from the supernet, recalibrate its
BatchNorm on a calibration split, and measure real mAP on a search split —
the semantics of ``/root/reference/arch_search/acc_pred.py`` +
``calibrate_test.py``, with the eval pipeline fused on TPU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from ..arch.macs import gmacs
from ..arch.schema import ArchConfig
from ..core.engine import EngineConfig, PoseEngine
from ..core.inference import InferenceFlags, normalize_images
from ..data.flip import flip_index_for
from ..models.litepose import ModelSpec, apply_litepose
from ..models.super_litepose import SuperDims, extract_subnet
from ..ops.group_ref import GroupParams
from .calibrate import calibrate_bn


class EfficiencyPredictor:
    """GMACs of a candidate (at its own img_size)."""

    def __init__(self, num_joints: int = 14):
        self.num_joints = num_joints

    def __call__(self, arch: ArchConfig) -> float:
        return gmacs(arch, self.num_joints)


class AccuracyPredictor:
    """Real-mAP accuracy of a candidate extracted from the supernet."""

    def __init__(
        self,
        super_params,
        super_state,
        dims: SuperDims,
        spec: ModelSpec,
        calib_dataset,  # PoseDataset (calibration split)
        search_dataset,  # PoseDataset (search split)
        cfg,
        n_calib_batches: int = 10,
        calib_batch_size: int = 16,
        max_eval_images: int = 0,
        cache: Optional[dict] = None,
        scoring: str = "extract",
    ):
        self.super_params = super_params
        self.super_state = super_state
        self.dims = dims
        self.spec = spec
        self.calib = calib_dataset
        self.search = search_dataset
        self.cfg = cfg
        self.n_calib_batches = n_calib_batches
        self.calib_batch_size = calib_batch_size
        self.max_eval_images = max_eval_images
        self.cache = cache if cache is not None else {}
        assert scoring in ("extract", "masked"), scoring
        self.scoring = scoring
        # masked scoring: compiled programs + engines shared across ALL
        # candidates (keyed only by img_size), since the mask descriptor is
        # a traced argument
        self._masked_engines: dict = {}
        self._masked_calib_fns: dict = {}

    def _calib_batches(self, img_size: int):
        """Center-resized square calibration batches (uint8)."""
        import cv2

        n = min(len(self.calib), self.n_calib_batches * self.calib_batch_size)
        batch = []
        for i in range(n):
            img, _, _ = self.calib.load_raw(i)
            batch.append(cv2.resize(img, (img_size, img_size)))
            if len(batch) == self.calib_batch_size:
                yield np.stack(batch)
                batch = []

    def __call__(self, arch: ArchConfig) -> float:
        key = str(sorted(arch.to_dict().items()))
        if key in self.cache:
            return self.cache[key]
        if self.scoring == "masked":
            acc = self._score_masked(arch)
            self.cache[key] = acc
            return acc
        params, state = extract_subnet(
            self.super_params, self.super_state, arch, self.dims, self.spec
        )

        def train_apply(p, s, images_u8):
            x = normalize_images(images_u8)
            return apply_litepose(p, s, x, self.spec, arch, train=True)

        state = calibrate_bn(
            jax.jit(train_apply), params, state, self._calib_batches(arch.img_size)
        )

        def eval_apply(p, s, x):
            outs, _ = apply_litepose(p, s, x, self.spec, arch, train=False)
            return outs

        cfg = self.cfg
        flags = InferenceFlags.from_config(
            cfg, flip_index_for(cfg.DATASET.DATASET, cfg.DATASET.WITH_CENTER)
        )
        engine = PoseEngine(
            eval_apply, params, state, flags, GroupParams.from_config(cfg),
            EngineConfig(
                input_size=arch.img_size,
                scale_factors=tuple(cfg.TEST.SCALE_FACTOR),
                project2image=cfg.TEST.PROJECT2IMAGE,
            ),
        )
        n = len(self.search) if not self.max_eval_images else min(
            self.max_eval_images, len(self.search)
        )
        # batched bucketed eval (PoseEngine.process_indexed): candidate archs
        # are scored over N images each, so per-image forwards would leave
        # most of the chip idle during the evolutionary search
        preds, scores = [], []
        for people, sc in engine.process_indexed(
            [self.search.image_size(i) for i in range(n)],
            lambda i: self.search.load_raw(i)[0],
            batch_size=self.calib_batch_size,
        ):
            preds.append(people)
            scores.append(sc)
        ids_backup = self.search.ids
        self.search.ids = ids_backup[:n]
        try:
            stats = self.search.evaluate(preds, scores)
        finally:
            self.search.ids = ids_backup
        acc = stats["AP"]
        self.cache[key] = acc
        return acc

    # -- masked scoring: one compiled program family per img_size ----------

    def _score_masked(self, arch: ArchConfig) -> float:
        """Score via the masked-at-max-width supernet forward instead of
        per-candidate extraction.

        TPU-first NAS scoring: the mask descriptor is a TRACED int32 vector
        (``apply_super_litepose``), so every candidate of a given input
        resolution shares ONE compiled calibration program and ONE compiled
        eval program — the search never recompiles as it mutates widths.
        The reference instantiates each candidate as a fresh torch model
        (``/root/reference/arch_search/acc_pred.py:22-34``), which on TPU
        would mean an XLA compile per candidate (minutes each at protocol
        resolutions).  Masked-vs-extracted forward equivalence on the
        active channel slice is pinned by tests/test_supernet.py; active-
        channel BN batch moments are therefore identical too, so BN
        calibration through the masked forward matches calibrating the
        extracted subnet.

        The search space fixes kernel size at the maximum (reference
        ``arch_manager.py:18-89``: expansion 6, kernel 7); kernel-cropped
        blocks would add a static axis and are rejected here.
        """
        from ..models.super_litepose import (apply_super_litepose,
                                             arch_to_mask_desc)

        for st in arch.backbone_setting:
            for _t, k in st.block_setting:
                if k != self.dims.kernel:
                    raise ValueError(
                        "masked scoring requires full-kernel candidates "
                        f"(got kernel {k}, max {self.dims.kernel})")

        desc = arch_to_mask_desc(arch, None)
        img_size = arch.img_size
        spec, dims = self.spec, self.dims

        if img_size not in self._masked_calib_fns:
            def train_apply(p, s, images_u8):
                x = normalize_images(images_u8)
                return apply_super_litepose(
                    p["net"], s, x, p["desc"], spec, dims, train=True)

            self._masked_calib_fns[img_size] = jax.jit(train_apply)
        calib_fn = self._masked_calib_fns[img_size]

        params = {"net": self.super_params, "desc": desc}
        state = calibrate_bn(
            calib_fn, params, self.super_state, self._calib_batches(img_size)
        )

        cfg = self.cfg
        if img_size not in self._masked_engines:
            def eval_apply(p, s, x):
                outs, _ = apply_super_litepose(
                    p["net"], s, x, p["desc"], spec, dims, train=False)
                return outs

            flags = InferenceFlags.from_config(
                cfg, flip_index_for(cfg.DATASET.DATASET, cfg.DATASET.WITH_CENTER)
            )
            self._masked_engines[img_size] = PoseEngine(
                eval_apply, params, state, flags,
                GroupParams.from_config(cfg),
                EngineConfig(
                    input_size=img_size,
                    scale_factors=tuple(cfg.TEST.SCALE_FACTOR),
                    project2image=cfg.TEST.PROJECT2IMAGE,
                ),
            )
        engine = self._masked_engines[img_size]
        # the fused programs take (params, state) as jit ARGUMENTS: swapping
        # the candidate's desc + calibrated state reuses the compiled code
        engine.params = params
        engine.state = state

        n = len(self.search) if not self.max_eval_images else min(
            self.max_eval_images, len(self.search)
        )
        preds, scores = [], []
        for people, sc in engine.process_indexed(
            [self.search.image_size(i) for i in range(n)],
            lambda i: self.search.load_raw(i)[0],
            batch_size=self.calib_batch_size,
        ):
            preds.append(people)
            scores.append(sc)
        ids_backup = self.search.ids
        self.search.ids = ids_backup[:n]
        try:
            stats = self.search.evaluate(preds, scores)
        finally:
            self.search.ids = ids_backup
        return stats["AP"]

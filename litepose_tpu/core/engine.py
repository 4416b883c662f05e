"""PoseEngine: end-to-end image -> people pipeline, decode fused on device.

Replaces the reference eval/deployment loop
(``/root/reference/valid.py:195-245`` and
``/root/reference/nano_demo/core/__init__.py:35-80``) with a TPU-first
design: for each input-shape bucket (the 64-px-aligned resize ladder yields
a small set of shapes) ONE jitted XLA program performs normalization,
forward pass, flip-test, stage aggregation, projection, NMS/top-k, AE
grouping, adjustment, and refinement.  Only the final fixed-size keypoint
arrays cross back to the host, where a 2x3 inverse affine maps them to
source-image coordinates.

The reference's host bottleneck — ``.cpu().numpy()`` mid-parse followed by
per-joint Python Munkres (``/root/reference/lib/core/group.py:170-174``) —
does not exist here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.affine import (
    get_affine_transform,
    get_final_preds,
    get_multi_scale_size,
    warp_image,
)
from ..ops.group import StaticGroupCfg, parse_batch
from ..ops.group_ref import GroupParams
from ..parallel.mesh import replicate_spec, shard_batch_spec, shard_pytree
from .inference import InferenceFlags, make_infer_fn, to_decode_layout


@dataclasses.dataclass
class EngineConfig:
    input_size: int = 448
    scale_factors: Tuple[float, ...] = (1.0,)
    with_adjust: bool = True
    with_refine: bool = True
    project2image: bool = True
    # decode modes: exact for eval parity, fast for serving
    assignment: str = "hungarian"  # or "greedy"
    topk_method: str = "exact"  # or "approx"
    decode_bf16: bool = False  # serving: bf16 aggregation/NMS glue


class PoseEngine:
    """Bucketed-compile pose estimation engine.

    Args:
      apply_fn: ``(params, state, images_f32_nhwc) -> [stage outputs]``.
      params, state: model pytrees (device-resident).
      flags: InferenceFlags (stage aggregation + flip test config).
      group: GroupParams (decode thresholds; joint order).
      config: EngineConfig.
    """

    def __init__(self, apply_fn, params, state, flags: InferenceFlags,
                 group: GroupParams, config: EngineConfig,
                 mesh=None):
        self.apply_fn = apply_fn
        self.params = params
        self.state = state
        if config.decode_bf16:
            flags = flags._replace(decode_bf16=True)
        self.flags = flags
        self.group_cfg = StaticGroupCfg.from_params(
            group, assignment=config.assignment, topk_method=config.topk_method
        )
        self.config = config
        # Multi-chip data-parallel serving: with a Mesh, params/state are
        # replicated across the chips and every batched program runs under
        # ``jax.shard_map`` with the batch dim sharded on the mesh's first
        # axis.  shard_map (not bare jit-with-sharded-inputs) is required
        # because the decode is Pallas kernels — custom calls XLA's SPMD
        # partitioner cannot split; per-device the whole fused program runs
        # on the local batch shard, with zero cross-chip communication (every
        # image's pipeline is independent), so throughput scales with chips
        # over ICI-free pure data parallelism.
        self.mesh = mesh
        if mesh is not None:
            self._data_axis = mesh.axis_names[0]
            self.params = shard_pytree(self.params, replicate_spec(mesh))
            self.state = shard_pytree(self.state, replicate_spec(mesh))
            self._batch_sharding = shard_batch_spec(mesh, self._data_axis)
        self._fused: Dict[Tuple[Tuple[int, int], bool], Callable] = {}
        self._infer: Dict[Tuple[Tuple[int, int], Tuple[int, int], bool], Callable] = {}
        self._decode: Dict[Tuple[int, int], Callable] = {}

    def _jit_batched(self, body: Callable) -> Callable:
        """jit a ``(params, state, images) -> outputs`` program, sharding the
        batch dim over the mesh when one is configured."""
        if self.mesh is None:
            return jax.jit(body)
        from jax.sharding import PartitionSpec as P

        spec = P(self._data_axis)
        # check_vma=False: the body contains Pallas custom calls, whose
        # out-shapes carry no varying-mesh-axes annotation for the checker
        mapped = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(), spec), out_specs=spec,
            check_vma=False,
        )
        return jax.jit(mapped)

    # -- compiled program builders -----------------------------------------

    def _fused_fn(self, in_hw: Tuple[int, int], out_hw: Optional[Tuple[int, int]],
                  sharded: bool = False):
        """Single-scale fully fused program: uint8 image -> people."""
        key = (in_hw, sharded)
        if key not in self._fused:
            # decode_layout: transpose-before-project (bit-identical, less
            # HBM traffic; see make_infer_fn)
            infer = make_infer_fn(self.apply_fn, self.flags,
                                  project_hw=out_hw, decode_layout=True)
            gcfg = self.group_cfg
            wa, wr = self.config.with_adjust, self.config.with_refine

            def fused(params, state, images_u8):
                det, tagt = infer(params, state, images_u8)
                return parse_batch(det, tagt, gcfg, wa, wr, tag_layout="thw")

            self._fused[key] = (
                self._jit_batched(fused) if sharded else jax.jit(fused)
            )
        return self._fused[key]

    def _infer_fn(self, in_hw, out_hw, keep_tags: bool):
        key = (in_hw, out_hw, keep_tags)
        if key not in self._infer:
            infer = make_infer_fn(self.apply_fn, self.flags, project_hw=out_hw)

            @jax.jit
            def run(params, state, images_u8):
                heat, tag = infer(params, state, images_u8)
                return heat, (tag if keep_tags else None)

            self._infer[key] = run
        return self._infer[key]

    def _decode_fn(self, hw):
        if hw not in self._decode:
            gcfg = self.group_cfg
            wa, wr = self.config.with_adjust, self.config.with_refine

            @jax.jit
            def decode(heat, tag):
                det, tagt = to_decode_layout(heat, tag)
                return parse_batch(det, tagt, gcfg, wa, wr)

            self._decode[hw] = decode
        return self._decode[hw]

    # -- public API ----------------------------------------------------------

    def process(self, image_rgb_u8: np.ndarray):
        """Full multi-scale + flip eval for one image (reference
        ``valid.py:195-245`` semantics).

        Returns (people list of (K, 3+T) arrays in source coords, scores).
        """
        cfg = self.config
        scales = sorted(cfg.scale_factors, reverse=True)
        min_scale = min(cfg.scale_factors)
        base_size, center, scale = get_multi_scale_size(
            image_rgb_u8.shape[:2], cfg.input_size, 1.0, min_scale
        )
        base_hw = (base_size[1], base_size[0])
        project_hw = base_hw if cfg.project2image else None

        if len(scales) == 1 and scales[0] == 1.0:
            size_resized, center, scale = get_multi_scale_size(
                image_rgb_u8.shape[:2], cfg.input_size, 1.0, min_scale
            )
            mat = get_affine_transform(center, scale, 0, size_resized)
            img = warp_image(image_rgb_u8, mat, size_resized)
            fn = self._fused_fn((img.shape[0], img.shape[1]), project_hw)
            people, scores, n = fn(self.params, self.state, img[None])
            # without projection the decode runs at the final stage
            # resolution (input / 2)
            hm_hw = project_hw if project_hw is not None else (
                img.shape[0] // 2, img.shape[1] // 2
            )
            return self._finalize(people, scores, n, center, scale, hm_hw)

        # multi-scale: accumulate heatmaps across scales, tags at scale 1.
        # With project2image everything is already at base_hw; without it,
        # the FIRST (largest) scale's heatmap resolution is the accumulation
        # grid, matching reference aggregate_results
        # (/root/reference/lib/core/inference.py:196-206 — final_heatmaps is
        # set by the first scale and later scales interpolate to it).
        heat_sum = None
        tags_keep = None
        accum_hw = base_hw if cfg.project2image else None
        for s in scales:
            size_resized, center, scale = get_multi_scale_size(
                image_rgb_u8.shape[:2], cfg.input_size, s, min_scale
            )
            mat = get_affine_transform(center, scale, 0, size_resized)
            img = warp_image(image_rgb_u8, mat, size_resized)
            keep = s == 1.0 or len(scales) == 1
            run = self._infer_fn((img.shape[0], img.shape[1]), project_hw, keep)
            heat, tag = run(self.params, self.state, img[None])
            if accum_hw is None:
                accum_hw = tuple(heat.shape[1:3])
            if heat.shape[1:3] != accum_hw:
                heat = jax.image.resize(
                    heat, (1, accum_hw[0], accum_hw[1], heat.shape[-1]), "bilinear"
                )
            heat_sum = heat if heat_sum is None else heat_sum + heat
            if keep and tag is not None:
                if tag.shape[1:3] != accum_hw:
                    tag = jax.image.resize(
                        tag,
                        (1, accum_hw[0], accum_hw[1]) + tag.shape[3:],
                        "bilinear",
                    )
                tags_keep = tag
        heat = heat_sum / float(len(scales))
        people, scores, n = self._decode_fn(accum_hw)(heat, tags_keep)
        return self._finalize(people, scores, n, center, scale, accum_hw)

    def _finalize(self, people, scores, n, center, scale, hm_hw):
        return self._finalize_one(
            np.asarray(people[0]), np.asarray(scores[0]), int(n[0]),
            center, scale, hm_hw,
        )

    def _finalize_one(self, people, scores, n, center, scale, hm_hw):
        people, scores = people[:n], scores[:n].tolist()
        finals = get_final_preds(people, center, scale, (hm_hw[1], hm_hw[0]))
        return finals, scores

    def process_indexed(self, shapes: Sequence[Tuple[int, int]],
                        load_fn: Callable[[int], np.ndarray],
                        batch_size: int = 16,
                        progress_cb: Optional[Callable[[int], None]] = None):
        """Batched full-protocol eval over many variable-size images,
        loaded lazily.

        The reference eval loop runs one image per forward
        (``/root/reference/valid.py:195-245``); on TPU that wastes most of
        the chip (a b1 forward costs nearly as much as b16).  The 64-px
        resize ladder maps source sizes onto a small set of warped shapes,
        so the WHOLE index set is bucketed by warped shape up front — from
        ``shapes`` alone, no pixels touched — and each bucket runs through
        the same fused program in ``batch_size`` chunks (only each bucket's
        final chunk is zero-padded).  ``load_fn(i)`` is called once per
        image at batch-assembly time, bounding host memory by one batch.
        Per-image results are identical to :meth:`process` — each image's
        pipeline is independent and the compiled program is the same one
        the single-image path uses at that shape.

        Multi-scale configs fall back to the per-image path (cross-scale
        accumulation grids differ per image).

        Args:
          shapes: per-image source ``(height, width)`` — e.g. straight from
            COCO annotation metadata.
          load_fn: index -> RGB uint8 image of that shape.
          progress_cb: called with the cumulative image count after each
            batch.

        Returns a list of ``(people, scores)`` pairs in source coords, in
        input order.
        """
        cfg = self.config
        if tuple(cfg.scale_factors) != (1.0,):
            out = []
            for i in range(len(shapes)):
                out.append(self.process(load_fn(i)))
                if progress_cb is not None:
                    progress_cb(i + 1)
            return out
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            batch_size = max(n_dev, (batch_size // n_dev) * n_dev)

        min_scale = min(cfg.scale_factors)
        metas = []
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i, src_hw in enumerate(shapes):
            size_resized, center, scale = get_multi_scale_size(
                tuple(src_hw), cfg.input_size, 1.0, min_scale
            )
            metas.append((size_resized, center, scale))
            buckets.setdefault((size_resized[1], size_resized[0]), []).append(i)

        results: List = [None] * len(shapes)
        done = 0
        # Double-buffered drive: JAX dispatch is asynchronous, so after
        # launching batch k we assemble batch k+1 (host-side image loading +
        # affine warps) while the device computes, and only then block on
        # batch k's results.  Host work and device compute overlap; the
        # reference loop (and a naive port) serializes them.
        pending = None  # (chunk, people, scores, n, hm_hw)

        def drain(pending):
            chunk, people, scores, n, hm_hw = pending
            people = np.asarray(people)
            scores = np.asarray(scores)
            n = np.asarray(n)
            for j, i in enumerate(chunk):
                _, center, scale = metas[i]
                results[i] = self._finalize_one(
                    people[j], scores[j], int(n[j]), center, scale, hm_hw
                )
            return len(chunk)

        for hw, idxs in buckets.items():
            project_hw = hw if cfg.project2image else None
            hm_hw = project_hw if project_hw is not None else (
                hw[0] // 2, hw[1] // 2
            )
            fn = self._fused_fn(hw, project_hw, sharded=self.mesh is not None)
            for lo in range(0, len(idxs), batch_size):
                chunk = idxs[lo:lo + batch_size]
                batch = np.zeros((batch_size, hw[0], hw[1], 3), np.uint8)
                for j, i in enumerate(chunk):
                    size_resized, center, scale = metas[i]
                    mat = get_affine_transform(center, scale, 0, size_resized)
                    batch[j] = warp_image(load_fn(i), mat, size_resized)
                imgs_dev = batch
                if self.mesh is not None:
                    imgs_dev = jax.device_put(batch, self._batch_sharding)
                people, scores, n = fn(self.params, self.state, imgs_dev)
                if pending is not None:
                    done += drain(pending)
                    if progress_cb is not None:
                        progress_cb(done)
                pending = (chunk, people, scores, n, hm_hw)
        if pending is not None:
            done += drain(pending)
            if progress_cb is not None:
                progress_cb(done)
        return results

    def process_many(self, images: Sequence[np.ndarray], batch_size: int = 16,
                     progress_cb: Optional[Callable[[int], None]] = None):
        """Batched eval over an in-memory image list — see
        :meth:`process_indexed`."""
        return self.process_indexed(
            [img.shape[:2] for img in images], lambda i: images[i],
            batch_size=batch_size, progress_cb=progress_cb,
        )

    def process_batch_square(self, images_u8: np.ndarray):
        """High-throughput serving path: a batch of images pre-resized to
        the square ``input_size``; one fused program, batched decode.

        With a mesh configured, the batch (which must divide evenly by the
        mesh size) is sharded across the chips and each runs the full fused
        pipeline on its shard — pure data-parallel scaling.

        Returns (people (B,P,K,3+T) in heatmap coords, scores (B,P),
        counts (B,)); callers map coords with their own inverse affines.
        """
        hw = (images_u8.shape[1], images_u8.shape[2])
        project_hw = hw if self.config.project2image else None
        sharded = self.mesh is not None
        if sharded:
            n_dev = self.mesh.devices.size
            if images_u8.shape[0] % n_dev != 0:
                raise ValueError(
                    f"batch {images_u8.shape[0]} not divisible by the "
                    f"{n_dev}-device mesh"
                )
            images_u8 = jax.device_put(images_u8, self._batch_sharding)
        fn = self._fused_fn(hw, project_hw, sharded=sharded)
        people, scores, n = fn(self.params, self.state, images_u8)
        return np.asarray(people), np.asarray(scores), np.asarray(n)

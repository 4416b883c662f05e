"""Jitted multi-stage output aggregation, flip test, multi-scale fusion.

TPU redesign of the reference inference helpers
(``/root/reference/lib/core/inference.py:75-208``): instead of a Python loop
interleaving host logic with GPU calls, each (architecture, input shape,
flags) combination builds ONE jitted function that runs the forward pass
(plus the horizontally flipped forward when flip-test is on), upsamples and
averages stage heatmaps, collects tag maps, and optionally projects both to
the base image size — entirely on device.

Aggregation semantics (must match for mAP parity):
  * non-final stage outputs are bilinearly upsampled (align_corners=False)
    to the final stage's size (inference.py:86-93);
  * heatmaps from stages with WITH_HEATMAPS_LOSS & TEST.WITH_HEATMAPS are
    averaged (inference.py:98-106);
  * tags come from stages with WITH_AE_LOSS & TEST.WITH_AE (the first stage
    only in LitePose configs) (inference.py:102-103);
  * flip test: forward the mirrored image, mirror the outputs back, permute
    channels by the dataset flip index; heatmaps become the mean of the two
    passes, and the flipped tags are stacked as an extra tag feature
    (inference.py:108-146, aggregate_results :176-208);
  * multi-scale: heatmaps summed across scales (caller divides), tags kept
    at scale 1 only (aggregate_results :179-206).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class InferenceFlags(NamedTuple):
    """Static decode-time configuration (hashable; safe to close over jit)."""

    num_joints: int
    with_heatmaps_loss: Tuple[bool, ...]
    with_ae_loss: Tuple[bool, ...]
    test_with_heatmaps: Tuple[bool, ...]
    test_with_ae: Tuple[bool, ...]
    tag_per_joint: bool = True
    flip_test: bool = False
    flip_index: Tuple[int, ...] = ()
    project2image: bool = False
    ignore_center: bool = False  # WITH_CENTER and TEST.IGNORE_CENTER
    # serving fast path: aggregate/upsample/transpose the decode tensors in
    # bf16 (halves the HBM traffic of the decode glue). Eval keeps fp32 for
    # reference-parity NMS tie behavior.
    decode_bf16: bool = False
    # flip-test execution strategy: "concat" runs ONE forward over the
    # [x; flip(x)] 2B batch (better utilization of one compiled program —
    # convs are batch-parallel so results are identical to two passes);
    # "twopass" mirrors the reference's two sequential forwards
    # (/root/reference/lib/core/inference.py:108-146).
    flip_mode: str = "concat"

    @staticmethod
    def from_config(cfg, flip_index: Sequence[int]) -> "InferenceFlags":
        return InferenceFlags(
            num_joints=cfg.DATASET.NUM_JOINTS,
            with_heatmaps_loss=tuple(cfg.LOSS.WITH_HEATMAPS_LOSS),
            with_ae_loss=tuple(cfg.LOSS.WITH_AE_LOSS),
            test_with_heatmaps=tuple(cfg.TEST.WITH_HEATMAPS),
            test_with_ae=tuple(cfg.TEST.WITH_AE),
            tag_per_joint=cfg.MODEL.TAG_PER_JOINT,
            flip_test=cfg.TEST.FLIP_TEST,
            flip_index=tuple(flip_index),
            project2image=cfg.TEST.PROJECT2IMAGE,
            ignore_center=bool(cfg.DATASET.WITH_CENTER and cfg.TEST.IGNORE_CENTER),
        )


def normalize_images(images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 RGB NHWC -> ImageNet-normalized float (reference ToTensor +
    Normalize, /root/reference/lib/dataset/transforms/build.py:78-82).

    dtype: serving passes bf16 (the model's first conv computes in bf16
    anyway, so materializing the normalized image in fp32 is a wasted
    double-width HBM pass); eval/train keep fp32."""
    scale = (1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float64))).astype(np.float32)
    bias = (-np.asarray(IMAGENET_MEAN, np.float64)
            / np.asarray(IMAGENET_STD, np.float64)).astype(np.float32)
    x = images.astype(dtype) * jnp.asarray(scale, dtype) + jnp.asarray(bias, dtype)
    return x


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize, half-pixel centers (== torch
    F.interpolate(mode='bilinear', align_corners=False)).

    XLA's resize lowering IS the fastest known formulation on TPU for the
    exact-2x protocol projections: measured 8.0 ms for all 42 projected
    planes at b32 vs 23.9 (stride-2 depthwise transposed conv) and 16.0
    (MXU interpolation-matrix matmuls) — see ops/upsample2x.py for the
    refuted alternatives and PERF_NOTES round-4."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, hw[0], hw[1], c), method="bilinear")


def _resize_nchw(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, C, h, w) bilinear resize — same 1D kernels/arithmetic as the
    NHWC form, W on the vector lanes."""
    n, c = x.shape[:2]
    return jax.image.resize(x, (n, c, hw[0], hw[1]), method="bilinear")


def _collect(outputs, flags: InferenceFlags):
    """Upsample non-final stages, average heatmaps, gather tags (NHWC)."""
    final_hw = outputs[-1].shape[1:3]
    heat_sum = None
    n_heat = 0
    tags = []
    for i, out in enumerate(outputs):
        if flags.decode_bf16:
            out = out.astype(jnp.bfloat16)
        if len(outputs) > 1 and i != len(outputs) - 1:
            out = _resize_bilinear(out, final_hw)
        offset = flags.num_joints if flags.with_heatmaps_loss[i] else 0
        if flags.with_heatmaps_loss[i] and flags.test_with_heatmaps[i]:
            hm = out[..., : flags.num_joints]
            heat_sum = hm if heat_sum is None else heat_sum + hm
            n_heat += 1
        if flags.with_ae_loss[i] and flags.test_with_ae[i]:
            tags.append(out[..., offset:])
    heat = heat_sum / n_heat if n_heat else None
    return heat, tags


def make_infer_fn(
    apply_fn: Callable[..., Any],
    flags: InferenceFlags,
    project_hw: Optional[Tuple[int, int]] = None,
    decode_layout: bool = False,
) -> Callable:
    """Build the per-shape jitted inference body.

    ``apply_fn(params, state, images)`` must return the model's list of
    stage outputs (NHWC).  The returned function maps
    ``(params, state, images_u8)`` -> (heatmaps (B,H,W,J),
    tags (B,H,W,J,T)) with flip/projection folded in.

    decode_layout=True returns the decode layout directly — det (B,J,H,W),
    tag (B,J,T,H,W) (the ``tag_layout="thw"`` form of ``parse_batch``) —
    with the transpose done BEFORE the projection resize.  Transpose and
    resize commute (the bilinear weights act on the H/W dims either way,
    identical per-element arithmetic), but the order matters for speed: the
    NHWC->NJHW transpose moves 4x less data at the pre-projection
    resolution, and the NCHW resize runs with W on the vector lanes instead
    of J=14 of 128 (measured 16.8 -> ~7 ms/b32 of eval-protocol glue at
    448; PERF_NOTES round-4).  Stacking the T tag sets on axis 2 BEFORE the
    projection (round 5) removes two further full-resolution tag
    materializations: the (..., T=2)-minor stack after the resize and the
    (B,K,H,W,T)->(B,K,T,H,W) transpose the refine kernel needed (both
    full 28-plane passes with a 2-wide minor dim).  Bit-parity with the
    post-projection transpose+stack is pinned in
    tests/test_inference_pipeline.py."""

    def infer(params, state, images_u8):
        x = normalize_images(
            images_u8, jnp.bfloat16 if flags.decode_bf16 else jnp.float32
        )
        if flags.flip_test and flags.flip_mode == "concat":
            b = x.shape[0]
            out2 = apply_fn(params, state, jnp.concatenate([x, x[:, :, ::-1, :]], 0))
            outputs = [o[:b] for o in out2]
            outputs_f = [o[b:] for o in out2]
        else:
            outputs = apply_fn(params, state, x)
            outputs_f = (
                apply_fn(params, state, x[:, :, ::-1, :]) if flags.flip_test else None
            )
        heat, tags = _collect(outputs, flags)

        if flags.flip_test:
            fidx = jnp.asarray(flags.flip_index, jnp.int32)
            outputs_f = [o[:, :, ::-1, :] for o in outputs_f]
            heat_f, tags_f = _collect(outputs_f, flags)
            heat_f = jnp.take(heat_f, fidx, axis=3)
            if flags.tag_per_joint:
                tags_f = [jnp.take(t, fidx, axis=3) for t in tags_f]
            heat = (heat + heat_f) / 2.0
            tags = tags + tags_f

        if flags.ignore_center:
            heat = heat[..., :-1]
            tags = [t[..., :-1] for t in tags]

        if decode_layout:
            heat = jnp.transpose(heat, (0, 3, 1, 2))  # (B, J, h, w)
            tags = [jnp.transpose(t, (0, 3, 1, 2)) for t in tags]
            # stack on axis 2 at the LOW resolution (cheap; minor dims stay
            # h, w), then resize H/W once — same per-element arithmetic as
            # resize-then-stack, no full-res re-materialization
            tag = jnp.stack(tags, axis=2)  # (B, J, T, h, w)
            if project_hw is not None:
                heat = _resize_nchw(heat, project_hw)
                # fold T into the channel axis with free reshapes (row-major
                # contiguous) so the projection stays one 4-D NCHW resize:
                # the direct 5-D jax.image.resize on (B,J,T,h,w) measured
                # +16 ms/b32 at 448 (eval protocol 447.7 -> 369.8 img/s)
                n, j, t = tag.shape[:3]
                tag = _resize_nchw(
                    tag.reshape(n, j * t, *tag.shape[3:]), project_hw
                ).reshape(n, j, t, *project_hw)
            return heat, tag  # tag_layout="thw"

        if project_hw is not None:
            heat = _resize_bilinear(heat, project_hw)
            tags = [_resize_bilinear(t, project_hw) for t in tags]

        tag = jnp.stack(tags, axis=-1)  # (B, H, W, J, T)
        return heat, tag

    return infer


def to_decode_layout(heat: jnp.ndarray, tag: jnp.ndarray):
    """NHWC aggregation layout -> (B,K,H,W) det and (B,K,H,W,T) tag used by
    the grouping kernels."""
    det = jnp.transpose(heat, (0, 3, 1, 2))
    tag = jnp.transpose(tag, (0, 3, 1, 2, 4))
    return det, tag

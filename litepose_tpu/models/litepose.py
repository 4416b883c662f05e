"""LitePose: single-branch mobile backbone + Fusion Deconv Head.

TPU-native functional reimplementation of the reference deployment model
(``/root/reference/lib/models/pose_mobilenet.py:21-156``):

  stem ("first"): 3x3 s2 convbnrelu(3->32) -> 3x3 depthwise convbnrelu ->
                  1x1 conv -> BN                                  (:36-41)
  backbone:       4 stages of InvBottleneck driven by the arch JSON (:44-60)
  head:           3 fusion-deconv levels — at each level a transposed conv of
                  the running feature ("refined") is summed with a transposed
                  conv of the matching backbone skip ("raw"), then BN+ReLU
                  (:102-135, forward :146-149); levels 1 and 2 emit outputs
                  via two SepConv2d(k=5) heads (refined + raw) summed
                  (:86-100, :151-154).

Outputs: a list of two NHWC maps at resolutions (img/4, img/2) with
``num_joints (+ num_joints tag channels when AE is on at that stage)``
channels.

The optional ``with_skips=False`` variant removes all raw/skip branches —
the "LitePose w/o fusion" ablation (``/root/reference/lib/models/pose_simplenet.py``).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..arch.schema import ArchConfig
from . import layers as L
from .layers import DEFAULT_POLICY, Policy

STEM_CHANNELS = 32


class ModelSpec(NamedTuple):
    """The subset of experiment config a model needs (decoupled from the
    full ConfigNode so models stay pure functions of hashable specs)."""

    num_joints: int = 14
    tag_per_joint: bool = True
    with_heatmaps_loss: Tuple[bool, ...] = (True, True)
    with_ae_loss: Tuple[bool, ...] = (True, False)
    num_deconv_layers: int = 3
    deconv_kernels: Tuple[int, ...] = (4, 4, 4)

    @staticmethod
    def from_config(cfg) -> "ModelSpec":
        return ModelSpec(
            num_joints=cfg.MODEL.NUM_JOINTS,
            tag_per_joint=cfg.MODEL.TAG_PER_JOINT,
            with_heatmaps_loss=tuple(cfg.LOSS.WITH_HEATMAPS_LOSS),
            with_ae_loss=tuple(cfg.LOSS.WITH_AE_LOSS),
            num_deconv_layers=cfg.MODEL.EXTRA.NUM_DECONV_LAYERS,
            deconv_kernels=tuple(cfg.MODEL.EXTRA.NUM_DECONV_KERNELS),
        )

    def final_channels(self) -> List[int]:
        """Output channels per emitted stage (reference ``_make_final_layers``,
        ``/root/reference/lib/models/pose_mobilenet.py:86-100``)."""
        dim_tag = self.num_joints if self.tag_per_joint else 1
        out = []
        for i in range(1, self.num_deconv_layers):
            oup_joint = self.num_joints if self.with_heatmaps_loss[i - 1] else 0
            oup_tag = dim_tag if self.with_ae_loss[i - 1] else 0
            out.append(oup_joint + oup_tag)
        return out


def _deconv_cfg(k: int) -> Tuple[int, int]:
    """(padding, output_padding) per deconv kernel size (reference
    ``_get_deconv_cfg``, ``/root/reference/lib/models/pose_mobilenet.py:73-84``)."""
    return {4: (1, 0), 3: (1, 1), 2: (0, 0)}[k]


def init_litepose(
    key: jax.Array,
    spec: ModelSpec,
    arch: ArchConfig,
    with_skips: bool = True,
):
    """Initialize (params, state) pytrees for a LitePose architecture."""
    keys = iter(jax.random.split(key, 4096))
    params: dict = {}
    state: dict = {}

    # stem
    p0, s0 = L.convbnrelu_init(next(keys), 3, STEM_CHANNELS, k=3)
    p1, s1 = L.convbnrelu_init(next(keys), STEM_CHANNELS, STEM_CHANNELS, k=3, groups=STEM_CHANNELS)
    p2 = L.conv_init(next(keys), 1, STEM_CHANNELS, arch.input_channel)
    pb, sb = L.bn_init(arch.input_channel)
    params["first"] = {"cbr0": p0, "cbr1": p1, "conv2": p2, "bn2": pb}
    state["first"] = {"cbr0": s0, "cbr1": s1, "bn2": sb}

    # backbone stages
    channels = [arch.input_channel]
    cin = arch.input_channel
    stages_p, stages_s = [], []
    for st in arch.backbone_setting:
        blocks_p, blocks_s = [], []
        for bi in range(st.num_blocks):
            t, k = st.block_setting[bi]
            bp, bs = L.inv_bottleneck_init(next(keys), cin, st.channel, ker=k, exp=t)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = st.channel
        stages_p.append(blocks_p)
        stages_s.append(blocks_s)
        channels.append(st.channel)
    params["stage"] = stages_p
    state["stage"] = stages_s

    # fusion deconv head
    filters = arch.deconv_setting
    inplanes = channels[-1]
    dr_p, dw_p, dbn_p, dbn_s = [], [], [], []
    for i in range(spec.num_deconv_layers):
        kd = spec.deconv_kernels[i]
        dr_p.append(L.deconv_init(next(keys), kd, inplanes, filters[i]))
        if with_skips:
            dw_p.append(L.deconv_init(next(keys), kd, channels[-i - 2], filters[i]))
        bp, bs = L.bn_init(filters[i])
        dbn_p.append(bp)
        dbn_s.append(bs)
        inplanes = filters[i]
    params["deconv_refined"] = dr_p
    params["deconv_bn"] = dbn_p
    state["deconv_bn"] = dbn_s
    if with_skips:
        params["deconv_raw"] = dw_p

    # final heads at levels 1..num_deconv_layers-1
    fr_p, fr_s, fw_p, fw_s = [], [], [], []
    for i, cout in enumerate(spec.final_channels(), start=1):
        pr, sr = L.sepconv_init(next(keys), filters[i], cout, ker=5)
        fr_p.append(pr)
        fr_s.append(sr)
        if with_skips:
            pw, sw = L.sepconv_init(next(keys), channels[-i - 3], cout, ker=5)
            fw_p.append(pw)
            fw_s.append(sw)
    params["final_refined"] = fr_p
    state["final_refined"] = fr_s
    if with_skips:
        params["final_raw"] = fw_p
        state["final_raw"] = fw_s

    return params, state


def apply_litepose(
    params,
    state,
    x: jnp.ndarray,
    spec: ModelSpec,
    arch: ArchConfig,
    train: bool = False,
    with_skips: bool = True,
    policy: Policy = DEFAULT_POLICY,
    out_dtype=jnp.float32,
):
    """Forward pass. ``x`` is NHWC in [0,1]-normalized float; returns
    (outputs, new_state) where outputs is a list of NHWC maps at
    (img/4, img/2) resolution (reference forward,
    ``/root/reference/lib/models/pose_mobilenet.py:137-156``).

    out_dtype: stage outputs are emitted in this dtype.  fp32 (default)
    matches the reference/eval numerics; the serving path passes bf16 so
    the decode glue never materializes fp32 maps (saves two full HBM passes
    over the img/2 head output per batch)."""
    ns: dict = {"first": {}, "stage": [], "deconv_bn": [], "final_refined": []}
    if with_skips:
        ns["final_raw"] = []

    p, s = params, state
    y, n0 = L.convbnrelu_apply(p["first"]["cbr0"], s["first"]["cbr0"], x, stride=2, train=train, policy=policy)
    y, n1 = L.convbnrelu_apply(p["first"]["cbr1"], s["first"]["cbr1"], y, groups=STEM_CHANNELS, train=train, policy=policy,
                               isolate=not train)
    y, nb = L.conv_bn(p["first"]["conv2"], p["first"]["bn2"], s["first"]["bn2"], y,
                      train=train, policy=policy)
    ns["first"] = {"cbr0": n0, "cbr1": n1, "bn2": nb}

    x_list = [y]
    for si, st in enumerate(arch.backbone_setting):
        blocks_ns = []
        for bi in range(st.num_blocks):
            stride = st.stride if bi == 0 else 1
            y, bn = L.inv_bottleneck_apply(
                p["stage"][si][bi], s["stage"][si][bi], y, stride=stride, train=train, policy=policy
            )
            blocks_ns.append(bn)
        ns["stage"].append(blocks_ns)
        x_list.append(y)

    final_outputs = []
    input_refined = x_list[-1]
    input_raw = x_list[-2]
    for i in range(spec.num_deconv_layers):
        kd = spec.deconv_kernels[i]
        pad, opad = _deconv_cfg(kd)
        nxt = L.deconv(p["deconv_refined"][i], input_refined, torch_padding=pad, output_padding=opad, policy=policy)
        if with_skips:
            nxt = nxt + L.deconv(p["deconv_raw"][i], input_raw, torch_padding=pad, output_padding=opad, policy=policy)
        y, nb = L.batch_norm(p["deconv_bn"][i], s["deconv_bn"][i], nxt, train)
        input_refined = L.relu(y)
        ns["deconv_bn"].append(nb)
        input_raw = x_list[-i - 3]
        if i > 0:
            out, nr = L.sepconv_apply(
                p["final_refined"][i - 1], s["final_refined"][i - 1], input_refined, train=train, policy=policy
            )
            ns["final_refined"].append(nr)
            if with_skips:
                out_raw, nw = L.sepconv_apply(
                    p["final_raw"][i - 1], s["final_raw"][i - 1], input_raw, train=train, policy=policy
                )
                ns["final_raw"].append(nw)
                out = out + out_raw
            final_outputs.append(out.astype(out_dtype))

    return final_outputs, ns


# jit + persistent-cache the init graph (see layers.jit_init)
init_litepose = L.jit_init(init_litepose, ("spec", "arch", "with_skips"))

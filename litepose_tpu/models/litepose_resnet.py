"""LitePose-ResNet: the second (FusedMBConv) search space.

Functional reimplementation of the reference's ResNet-style variant
(``/root/reference/lib/models/pose_resnet.py``) and its channel-search
supernet (``pose_superresnet.py``):

  stem: 7x7 s2 convbnrelu(3->32) + 7x7 convbnrelu(32->input_channel);
  backbone: 4 stages of FusedMBConv (k-conv expand, 1x1 project) with the
  (r, k, c, n, s) table (:25-31);
  head: UpConv fusion (2x nearest upsample + conv) with refined+raw
  branches (:93-110) and plain 3x3 final convs with bias (:77-91).

The supernet variant searches channels only; like super_litepose it runs
masked at max width (one compiled graph over the width space).  The
reference forward passes ``block_setting`` expansion (6) into blocks built
with r=4 — the slice silently clamps to the allocated width; we use the
allocated expansion r (documented divergence).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..arch.manager import ArchManager
from ..arch.schema import ArchConfig, make_divisible
from . import layers as L
from .layers import DEFAULT_POLICY, Policy
from .litepose import ModelSpec
from .super_litepose import _mask, masked_bn

# (expand_ratio, kernel, channel, num_blocks, stride) — fixed net
RESNET_SETTING = ((4, 7, 16, 4, 2), (4, 7, 32, 6, 2), (4, 5, 48, 8, 2), (4, 3, 80, 8, 1))
# supernet maximal table (pose_superresnet.py:27-33)
SUPER_RESNET_SETTING = ((4, 7, 32, 4, 2), (4, 7, 64, 6, 2), (4, 5, 96, 8, 2), (4, 3, 160, 8, 1))
RESNET_INPUT_CHANNEL = 16
SUPER_RESNET_INPUT_CHANNEL = 24


def resnet_arch_manager(deconv_setting=(64, 48, 32), seed=None) -> ArchManager:
    """ArchManager over the ResNet search space (channel-only)."""
    return ArchManager(
        deconv_setting=deconv_setting,
        input_channel=SUPER_RESNET_INPUT_CHANNEL,
        stage_setting=tuple((c, n, s) for _, _, c, n, s in SUPER_RESNET_SETTING),
        seed=seed,
    )


def init_litepose_resnet(key, spec: ModelSpec, width_mult: float = 1.0,
                         deconv_filters: Sequence[int] = (64, 48, 32),
                         deconv_kernels: Sequence[int] = (3, 3, 3)):
    keys = iter(jax.random.split(key, 2048))
    params: dict = {}
    state: dict = {}
    ic = make_divisible(RESNET_INPUT_CHANNEL * width_mult, 8)
    p0, s0 = L.convbnrelu_init(next(keys), 3, 32, k=7)
    p1, s1 = L.convbnrelu_init(next(keys), 32, ic, k=7)
    params["first"] = {"cbr0": p0, "cbr1": p1}
    state["first"] = {"cbr0": s0, "cbr1": s1}

    channels = [ic]
    cin = ic
    stages_p, stages_s = [], []
    for r, k, c, n, s in RESNET_SETTING:
        c = make_divisible(c * width_mult, 8)
        blocks_p, blocks_s = [], []
        for bi in range(n):
            bp, bs = L.fused_mbconv_init(next(keys), cin, c, k=k, r=r)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = c
        stages_p.append(blocks_p)
        stages_s.append(blocks_s)
        channels.append(c)
    params["stage"] = stages_p
    state["stage"] = stages_s

    inplanes = channels[-1]
    up_r, up_w, up_bn_p, up_bn_s = [], [], [], []
    for i in range(spec.num_deconv_layers):
        k = deconv_kernels[i]
        pr, _ = L.upconv_init(next(keys), inplanes, deconv_filters[i], k=k)
        pw, _ = L.upconv_init(next(keys), channels[-i - 2], deconv_filters[i], k=k)
        up_r.append(pr)
        up_w.append(pw)
        bp, bs = L.bn_init(deconv_filters[i])
        up_bn_p.append(bp)
        up_bn_s.append(bs)
        inplanes = deconv_filters[i]
    params["deconv_refined"] = up_r
    params["deconv_raw"] = up_w
    params["deconv_bn"] = up_bn_p
    state["deconv_bn"] = up_bn_s

    fr, fw = [], []
    for i, cout in enumerate(spec.final_channels(), start=1):
        wr = L.conv_init(next(keys), 3, deconv_filters[i], cout)
        wr["b"] = jnp.zeros((cout,))
        ww = L.conv_init(next(keys), 3, channels[-i - 3], cout)
        ww["b"] = jnp.zeros((cout,))
        fr.append(wr)
        fw.append(ww)
    params["final_refined"] = fr
    params["final_raw"] = fw
    return params, state


def apply_litepose_resnet(params, state, x, spec: ModelSpec,
                          deconv_kernels: Sequence[int] = (3, 3, 3),
                          train: bool = False, policy: Policy = DEFAULT_POLICY):
    p, s = params, state
    ns: dict = {"first": {}, "stage": [], "deconv_bn": []}
    y, n0 = L.convbnrelu_apply(p["first"]["cbr0"], s["first"]["cbr0"], x, stride=2, train=train, policy=policy)
    y, n1 = L.convbnrelu_apply(p["first"]["cbr1"], s["first"]["cbr1"], y, train=train, policy=policy)
    ns["first"] = {"cbr0": n0, "cbr1": n1}

    x_list = [y]
    for si, (r, k, c, n, st) in enumerate(RESNET_SETTING):
        blocks_ns = []
        for bi in range(len(p["stage"][si])):
            stride = st if bi == 0 else 1
            y, bn = L.fused_mbconv_apply(p["stage"][si][bi], s["stage"][si][bi], y, stride=stride, train=train, policy=policy)
            blocks_ns.append(bn)
        ns["stage"].append(blocks_ns)
        x_list.append(y)

    final_outputs = []
    input_refined = x_list[-1]
    input_raw = x_list[-2]
    for i in range(spec.num_deconv_layers):
        nr, _ = L.upconv_apply(p["deconv_refined"][i], {}, input_refined, policy=policy)
        nw, _ = L.upconv_apply(p["deconv_raw"][i], {}, input_raw, policy=policy)
        y2, nb = L.batch_norm(p["deconv_bn"][i], s["deconv_bn"][i], nr + nw, train)
        input_refined = L.relu(y2)
        ns["deconv_bn"].append(nb)
        input_raw = x_list[-i - 3]
        if i > 0:
            fo = L.conv(p["final_refined"][i - 1], input_refined, policy=policy)
            fo = fo + p["final_refined"][i - 1]["b"].astype(fo.dtype)
            fw = L.conv(p["final_raw"][i - 1], input_raw, policy=policy)
            fw = fw + p["final_raw"][i - 1]["b"].astype(fw.dtype)
            final_outputs.append((fo + fw).astype(jnp.float32))
    return final_outputs, ns


# -- channel-search supernet ---------------------------------------------------


def init_super_litepose_resnet(key, spec: ModelSpec,
                               deconv_filters: Sequence[int] = (64, 48, 32),
                               deconv_kernels: Sequence[int] = (3, 3, 3)):
    keys = iter(jax.random.split(key, 2048))
    params: dict = {}
    state: dict = {}
    ic = SUPER_RESNET_INPUT_CHANNEL
    p0, s0 = L.convbnrelu_init(next(keys), 3, 32, k=7)
    params["first"] = {"cbr0": p0, "conv1": L.conv_init(next(keys), 7, 32, ic)}
    pb, sb = L.bn_init(ic)
    params["first"]["bn1"] = pb
    state["first"] = {"cbr0": s0, "bn1": sb}

    channels = [ic]
    cin = ic
    stages_p, stages_s = [], []
    for r, k, c, n, s in SUPER_RESNET_SETTING:
        blocks_p, blocks_s = [], []
        for bi in range(n):
            feat = make_divisible(round(cin * r), 8)
            bp = {
                "inv": {"conv": L.conv_init(next(keys), k, cin, feat)},
                "point": {"conv": L.conv_init(next(keys), 1, feat, c)},
            }
            bs = {}
            for name, width in (("inv", feat), ("point", c)):
                pbn, sbn = L.bn_init(width)
                bp[name]["bn"] = pbn
                bs[name] = {"bn": sbn}
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = c
        stages_p.append(blocks_p)
        stages_s.append(blocks_s)
        channels.append(c)
    params["stage"] = stages_p
    state["stage"] = stages_s

    inplanes = channels[-1]
    up_r, up_w, bn_p, bn_s = [], [], [], []
    for i in range(spec.num_deconv_layers):
        k = deconv_kernels[i]
        pr, _ = L.upconv_init(next(keys), inplanes, deconv_filters[i], k=k)
        pw, _ = L.upconv_init(next(keys), channels[-i - 2], deconv_filters[i], k=k)
        up_r.append(pr)
        up_w.append(pw)
        bp, bs = L.bn_init(deconv_filters[i])
        bn_p.append(bp)
        bn_s.append(bs)
        inplanes = deconv_filters[i]
    params["deconv_refined"] = up_r
    params["deconv_raw"] = up_w
    params["deconv_bn"] = bn_p
    state["deconv_bn"] = bn_s

    fr, fw = [], []
    for i, cout in enumerate(spec.final_channels(), start=1):
        wr = L.conv_init(next(keys), 3, deconv_filters[i], cout)
        wr["b"] = jnp.zeros((cout,))
        ww = L.conv_init(next(keys), 3, channels[-i - 3], cout)
        ww["b"] = jnp.zeros((cout,))
        fr.append(wr)
        fw.append(ww)
    params["final_refined"] = fr
    params["final_raw"] = fw
    return params, state


def apply_super_litepose_resnet(params, state, x, mask_desc, spec: ModelSpec,
                                train: bool = False, policy: Policy = DEFAULT_POLICY):
    """Masked channel-search forward. mask_desc layout matches
    ``arch_to_mask_desc``: [input_channel, c0..c3, d0..d2]."""
    p, s = params, state
    ns: dict = {"first": {}, "stage": [], "deconv_bn": []}
    setting = SUPER_RESNET_SETTING
    max_channels = [SUPER_RESNET_INPUT_CHANNEL] + [c for _, _, c, _, _ in setting]
    in_n = mask_desc[0]
    stage_n = [mask_desc[1 + i] for i in range(4)]
    deconv_n = [mask_desc[5 + i] for i in range(3)]

    y, n0 = L.convbnrelu_apply(p["first"]["cbr0"], s["first"]["cbr0"], x, stride=2, train=train, policy=policy)
    stem_mask = _mask(in_n, max_channels[0])
    y = L.conv(p["first"]["conv1"], y, policy=policy) * stem_mask.astype(policy.compute_dtype)
    y, nb = masked_bn(p["first"]["bn1"], s["first"]["bn1"], y, stem_mask, train)
    y = L.relu6(y)
    ns["first"] = {"cbr0": n0, "bn1": nb}

    x_list = [y]
    cur_n = in_n
    cur_max = max_channels[0]
    for si, (r, k, c, n, st) in enumerate(setting):
        blocks_ns = []
        for bi in range(n):
            stride = st if bi == 0 else 1
            bp, bs = p["stage"][si][bi], s["stage"][si][bi]
            feat_max = bp["inv"]["conv"]["w"].shape[-1]
            feat_n = cur_n * r
            feat_mask = _mask(feat_n, feat_max)
            out_mask = _mask(stage_n[si], c)
            z = L.conv(bp["inv"]["conv"], y, stride=stride, policy=policy) * feat_mask.astype(policy.compute_dtype)
            z, nb1 = masked_bn(bp["inv"]["bn"], bs["inv"]["bn"], z, feat_mask, train)
            z = L.relu6(z)
            z = L.conv(bp["point"]["conv"], z, policy=policy) * out_mask.astype(policy.compute_dtype)
            z, nb2 = masked_bn(bp["point"]["bn"], bs["point"]["bn"], z, out_mask, train)
            if stride == 1 and cur_max == c and bi > 0:
                z = z + y
            y = z
            blocks_ns.append({"inv": {"bn": nb1}, "point": {"bn": nb2}})
            cur_n = stage_n[si]
            cur_max = c
        ns["stage"].append(blocks_ns)
        x_list.append(y)

    final_outputs = []
    input_refined = x_list[-1]
    input_raw = x_list[-2]
    for i in range(spec.num_deconv_layers):
        d_mask = _mask(deconv_n[i], p["deconv_bn"][i]["scale"].shape[0])
        nr, _ = L.upconv_apply(p["deconv_refined"][i], {}, input_refined, policy=policy)
        nw, _ = L.upconv_apply(p["deconv_raw"][i], {}, input_raw, policy=policy)
        z = (nr + nw) * d_mask.astype(nr.dtype)
        z, nb = masked_bn(p["deconv_bn"][i], s["deconv_bn"][i], z, d_mask, train)
        input_refined = L.relu(z)
        ns["deconv_bn"].append(nb)
        input_raw = x_list[-i - 3]
        if i > 0:
            fo = L.conv(p["final_refined"][i - 1], input_refined, policy=policy)
            fo = fo + p["final_refined"][i - 1]["b"].astype(fo.dtype)
            fw = L.conv(p["final_raw"][i - 1], input_raw, policy=policy)
            fw = fw + p["final_raw"][i - 1]["b"].astype(fw.dtype)
            final_outputs.append((fo + fw).astype(jnp.float32))
    return final_outputs, ns


# jit + persistent-cache the init graphs (see layers.jit_init)
init_litepose_resnet = L.jit_init(
    init_litepose_resnet, ("spec", "width_mult", "deconv_filters", "deconv_kernels"))
init_super_litepose_resnet = L.jit_init(
    init_super_litepose_resnet, ("spec", "deconv_filters", "deconv_kernels"))

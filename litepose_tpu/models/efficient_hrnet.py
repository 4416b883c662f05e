"""EfficientHRNet baseline (functional NHWC reimplementation).

Baseline model for comparisons (reference:
``/root/reference/lib/models/pose_efficient_hrnet.py``): an EfficientNet
backbone (MBConv + squeeze-excitation + Swish, TF-style asymmetric SAME
padding) with feature taps at four scales (tap indices are hardcoded per
``depth_mult``, forward :541-...), per-branch 3x3 conv transitions, HRNet
BASIC-block stages whose widths scale by ``1.2455 ** SCALE_FACTOR``, and the
Higher deconv head with CAT_OUTPUT (shared with our higher_hrnet module).
"""

from __future__ import annotations

import math
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import layers as L
from .higher_hrnet import (
    StageSpec,
    _basic,
    _basic_init,
    _convbn,
    _convbn_init,
    _module_apply,
    _module_init,
)
from .layers import DEFAULT_POLICY, Policy
from .litepose import _deconv_cfg

# EfficientNet-B0 block settings: (expand, channels, repeats, stride, kernel)
EFFNET_SETTINGS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# Per-depth_mult feature-tap boundaries (exclusive end index into the
# features list, including the stem at index 0) — reference forward
# :541-632 hardcodes these per model variant.
DEPTH_TAPS = {
    0.483: (3, 4, 8, 11),
    0.578: (4, 6, 10, 14),
    0.694: (4, 6, 12, 16),
    0.833: (4, 6, 12, 17),
    1.0: (4, 6, 12, 17),
    1.1: (6, 9, 17, 24),
    1.2: (6, 9, 17, 24),
    1.4: (6, 9, 19, 27),
    1.8: (7, 11, 23, 33),
}


def _make_divisible(value, divisor=8):
    new_value = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return new_value


def _round_filters(filters, width_mult):
    if width_mult == 1.0:
        return filters
    return int(_make_divisible(filters * width_mult))


def _round_repeats(repeats, depth_mult):
    if depth_mult == 1.0:
        return repeats
    return int(math.ceil(depth_mult * repeats))


def _scale(c, scale_factor):
    return int(math.ceil(c * (1.2455 ** scale_factor)))


class EffHRNetSpec(NamedTuple):
    num_joints: int = 14
    tag_per_joint: bool = True
    with_ae_loss: Tuple[bool, ...] = (True, False)
    width_mult: float = 0.909
    depth_mult: float = 0.833
    scale_factor: int = -1
    final_conv_kernel: int = 1
    stage2: StageSpec = StageSpec(1, 2, "BASIC", (2, 2), (32, 64))
    stage3: StageSpec = StageSpec(3, 3, "BASIC", (2, 2, 2), (32, 64, 128))
    stage4: StageSpec = StageSpec(3, 4, "BASIC", (2, 2, 2, 2), (32, 64, 128, 256))
    num_deconvs: int = 1
    deconv_channels: Tuple[int, ...] = (32,)
    deconv_kernels: Tuple[int, ...] = (4,)
    deconv_num_basic_blocks: int = 2
    cat_output: Tuple[bool, ...] = (True,)

    @staticmethod
    def from_config(cfg) -> "EffHRNetSpec":
        e = cfg.MODEL.EXTRA

        def stage(s):
            return StageSpec(
                s.NUM_MODULES, s.NUM_BRANCHES, s.BLOCK,
                tuple(s.NUM_BLOCKS), tuple(s.NUM_CHANNELS),
            )

        return EffHRNetSpec(
            num_joints=cfg.MODEL.NUM_JOINTS,
            tag_per_joint=cfg.MODEL.TAG_PER_JOINT,
            with_ae_loss=tuple(cfg.LOSS.WITH_AE_LOSS),
            width_mult=cfg.MODEL.WIDTH_MULT,
            depth_mult=cfg.MODEL.DEPTH_MULT,
            scale_factor=cfg.MODEL.SCALE_FACTOR,
            final_conv_kernel=e.FINAL_CONV_KERNEL,
            stage2=stage(e.STAGE2),
            stage3=stage(e.STAGE3),
            stage4=stage(e.STAGE4),
            num_deconvs=e.DECONV.NUM_DECONVS,
            deconv_channels=tuple(e.DECONV.NUM_CHANNELS),
            deconv_kernels=tuple(e.DECONV.KERNEL_SIZE),
            deconv_num_basic_blocks=e.DECONV.NUM_BASIC_BLOCKS,
            cat_output=tuple(e.DECONV.CAT_OUTPUT),
        )

    def scaled_stage_channels(self, st: StageSpec) -> Tuple[int, ...]:
        return tuple(_scale(c, self.scale_factor) for c in st.num_channels)

    def final_out_channels(self, idx: int) -> int:
        dim_tag = self.num_joints if self.tag_per_joint else 1
        return self.num_joints + (dim_tag if self.with_ae_loss[idx] else 0)

    def backbone_plan(self) -> List[Tuple[int, int, int, int, int]]:
        """Expanded per-block list: (cin, cout, expand, kernel, stride);
        index 0 is the stem (marked with expand == 0)."""
        plan = [(3, _round_filters(32, self.width_mult), 0, 3, 2)]
        cin = plan[0][1]
        for t, c, n, s, k in EFFNET_SETTINGS:
            cout = _round_filters(c, self.width_mult)
            for i in range(_round_repeats(n, self.depth_mult)):
                plan.append((cin, cout, t, k, s if i == 0 else 1))
                cin = cout
        return plan

    def taps(self) -> Tuple[int, int, int, int]:
        return DEPTH_TAPS[self.depth_mult]


def swish(x):
    return x * jax.nn.sigmoid(x)


def _same_pad(kernel: int, stride: int):
    """TF-style SAME padding: asymmetric for even overhang (reference
    ConvBNReLU._get_padding, pose_efficient_hrnet.py:63-65)."""
    p = max(kernel - stride, 0)
    return ((p // 2, p - p // 2), (p // 2, p - p // 2))


def _conv_same(p, x, kernel, stride, groups=1, policy=DEFAULT_POLICY,
               isolate=False):
    (pt, pb), (pl_, pr) = _same_pad(kernel, stride)
    if isolate:
        # stop XLA fusing the upstream conv into this (depthwise) conv's
        # operand fusion — see layers.conv isolate docstring
        x = lax.optimization_barrier(x)
    y = lax.conv_general_dilated(
        x.astype(policy.compute_dtype),
        p["w"].astype(policy.compute_dtype),
        window_strides=(stride, stride),
        padding=[(pt, pb), (pl_, pr)],
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision,
    )
    return y


# -- MBConv block -------------------------------------------------------------


def _mbconv_init(key, cin, cout, expand, kernel):
    keys = iter(jax.random.split(key, 8))
    hidden = cin * expand
    reduced = max(1, cin // 4)
    params: dict = {}
    state: dict = {}
    if hidden != cin:
        params["expand"] = {"conv": L.conv_init(next(keys), 1, cin, hidden)}
        pb, sb = L.bn_init(hidden)
        params["expand"]["bn"] = pb
        state["expand"] = {"bn": sb}
    params["dw"] = {"conv": L.conv_init(next(keys), kernel, hidden, hidden, groups=hidden)}
    pb, sb = L.bn_init(hidden)
    params["dw"]["bn"] = pb
    state["dw"] = {"bn": sb}
    # SE convs carry biases (nn.Conv2d default)
    params["se"] = {
        "r": {"w": L.conv_init(next(keys), 1, hidden, reduced)["w"], "b": jnp.zeros((reduced,))},
        "e": {"w": L.conv_init(next(keys), 1, reduced, hidden)["w"], "b": jnp.zeros((hidden,))},
    }
    params["project"] = {"conv": L.conv_init(next(keys), 1, hidden, cout)}
    pb, sb = L.bn_init(cout)
    params["project"]["bn"] = pb
    state["project"] = {"bn": sb}
    return params, state


def _mbconv(p, s, x, expand, kernel, stride, train=False, policy=DEFAULT_POLICY):
    cin = x.shape[-1]
    hidden = p["dw"]["conv"]["w"].shape[-1]
    cout = p["project"]["conv"]["w"].shape[-1]
    ns: dict = {}
    y = x
    if "expand" in p:
        y = _conv_same(p["expand"]["conv"], y, 1, 1, policy=policy)
        y, nb = L.batch_norm(p["expand"]["bn"], s["expand"]["bn"], y, train)
        y = swish(y)
        ns["expand"] = {"bn": nb}
    y = _conv_same(p["dw"]["conv"], y, kernel, stride, groups=hidden, policy=policy,
                   isolate=not train)
    y, nb = L.batch_norm(p["dw"]["bn"], s["dw"]["bn"], y, train)
    y = swish(y)
    ns["dw"] = {"bn": nb}
    # squeeze-excitation
    se = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
    se = se.astype(y.dtype)
    se = jnp.einsum("bijc,cd->bijd", se, p["se"]["r"]["w"][0, 0].astype(y.dtype)) + p["se"]["r"]["b"].astype(y.dtype)
    se = swish(se)
    se = jnp.einsum("bijc,cd->bijd", se, p["se"]["e"]["w"][0, 0].astype(y.dtype)) + p["se"]["e"]["b"].astype(y.dtype)
    y = y * jax.nn.sigmoid(se)
    y = _conv_same(p["project"]["conv"], y, 1, 1, policy=policy)
    y, nb = L.batch_norm(p["project"]["bn"], s["project"]["bn"], y, train)
    ns["project"] = {"bn": nb}
    # drop-connect is inference-inert (reference _drop_connect returns x in
    # eval mode); training support would thread an rng here
    if cin == cout and stride == 1:
        y = y + x
    return y, ns


# -- full network --------------------------------------------------------------


def init_efficient_hrnet(key, spec: EffHRNetSpec):
    keys = iter(jax.random.split(key, 4096))
    params: dict = {}
    state: dict = {}
    plan = spec.backbone_plan()

    feats_p, feats_s = [], []
    for cin, cout, expand, kernel, stride in plan:
        if expand == 0:  # stem ConvBNReLU
            fp = {"conv": L.conv_init(next(keys), kernel, cin, cout)}
            pb, sb = L.bn_init(cout)
            fp["bn"] = pb
            feats_p.append(fp)
            feats_s.append({"bn": sb})
        else:
            fp, fs = _mbconv_init(next(keys), cin, cout, expand, kernel)
            feats_p.append(fp)
            feats_s.append(fs)
    params["features"] = feats_p
    state["features"] = feats_s

    t1, t2, t3, t4 = spec.taps()
    tap_channels = [plan[t1 - 1][1], plan[t2 - 1][1], plan[t3 - 1][1], plan[t4 - 1][1]]

    sf = spec.scale_factor
    trans_defs = [
        # (name, in_c, out_c) — per-branch 3x3 conv+bn+relu WITH bias
        ("trans1", [(tap_channels[0], _scale(32, sf)), (tap_channels[1], _scale(64, sf))]),
        ("trans2", [(_scale(32, sf), _scale(32, sf)), (_scale(64, sf), _scale(64, sf)),
                    (tap_channels[2], _scale(128, sf))]),
        ("trans3", [(_scale(32, sf), _scale(32, sf)), (_scale(64, sf), _scale(64, sf)),
                    (_scale(128, sf), _scale(128, sf)), (tap_channels[3], _scale(256, sf))]),
    ]
    for name, branches in trans_defs:
        b_p, b_s = [], []
        for cin, cout in branches:
            pp = {"conv": L.conv_init(next(keys), 3, cin, cout)}
            pp["conv"]["b"] = jnp.zeros((cout,))
            pb, sb = L.bn_init(cout)
            pp["bn"] = pb
            b_p.append(pp)
            b_s.append({"bn": sb})
        params[name] = b_p
        state[name] = b_s

    for name, st in (("2", spec.stage2), ("3", spec.stage3), ("4", spec.stage4)):
        chans = list(spec.scaled_stage_channels(st))
        scaled = StageSpec(st.num_modules, st.num_branches, st.block,
                           st.num_blocks, tuple(chans))
        mods_p, mods_s = [], []
        last_stage = name == "4"
        cur = list(chans)
        for mi in range(st.num_modules):
            mso = not (last_stage and mi == st.num_modules - 1)
            mp, ms, cur = _module_init(next(keys), scaled, cur, 1, mso)
            mods_p.append(mp)
            mods_s.append(ms)
        params[f"stage{name}"] = mods_p
        state[f"stage{name}"] = mods_s

    input_channels = spec.scaled_stage_channels(spec.stage4)[0]
    finals = []
    for i in range(spec.num_deconvs + 1):
        cout = spec.final_out_channels(i)
        cin_f = input_channels if i == 0 else _scale(spec.deconv_channels[i - 1], sf)
        w = L.conv_init(next(keys), spec.final_conv_kernel, cin_f, cout)
        w["b"] = jnp.zeros((cout,))
        finals.append(w)
    params["final"] = finals

    dec_p, dec_s = [], []
    cin_d = input_channels
    for i in range(spec.num_deconvs):
        if spec.cat_output[i]:
            cin_d += spec.final_out_channels(i)
        cout = _scale(spec.deconv_channels[i], sf)
        dp = {"deconv": L.deconv_init(next(keys), spec.deconv_kernels[i], cin_d, cout)}
        pb, sb = L.bn_init(cout)
        dp["bn"] = pb
        ds = {"bn": sb}
        blocks_p, blocks_s = [], []
        for _ in range(spec.deconv_num_basic_blocks):
            bp, bs = _basic_init(next(keys), cout, cout)
            blocks_p.append(bp)
            blocks_s.append(bs)
        dp["blocks"] = blocks_p
        ds["blocks"] = blocks_s
        dec_p.append(dp)
        dec_s.append(ds)
        cin_d = cout
    params["deconv"] = dec_p
    state["deconv"] = dec_s
    return params, state


def apply_efficient_hrnet(params, state, x, spec: EffHRNetSpec, train=False,
                          policy: Policy = DEFAULT_POLICY):
    p, s = params, state
    ns: dict = {"features": []}
    plan = spec.backbone_plan()
    t1, t2, t3, t4 = spec.taps()

    taps = {}
    y = x
    for i, (cin, cout, expand, kernel, stride) in enumerate(plan):
        if expand == 0:
            y = _conv_same(p["features"][i]["conv"], y, kernel, stride, policy=policy)
            y, nb = L.batch_norm(p["features"][i]["bn"], s["features"][i]["bn"], y, train)
            y = swish(y)
            ns["features"].append({"bn": nb})
        else:
            y, nf = _mbconv(p["features"][i], s["features"][i], y, expand, kernel, stride,
                            train=train, policy=policy)
            ns["features"].append(nf)
        for tap_i, tap_end in enumerate((t1, t2, t3, t4), start=1):
            if i == tap_end - 1:
                taps[tap_i] = y

    def trans(name, idx, z):
        pp, ss = p[name][idx], s[name][idx]
        out = _conv_same(pp["conv"], z, 3, 1, policy=policy)
        out = out + pp["conv"]["b"].astype(out.dtype)
        out, nb = L.batch_norm(pp["bn"], ss["bn"], out, train)
        return L.relu(out), {"bn": nb}

    ns_t: dict = {}
    x_list, t_ns = [], []
    for i, src in enumerate((taps[1], taps[2])):
        z, n = trans("trans1", i, src)
        x_list.append(z)
        t_ns.append(n)
    ns_t["trans1"] = t_ns

    def run_stage(name, st, xs):
        chans = spec.scaled_stage_channels(st)
        scaled = StageSpec(st.num_modules, st.num_branches, st.block, st.num_blocks, chans)
        mods_ns = []
        last_stage = name == "4"
        for mi in range(st.num_modules):
            mso = not (last_stage and mi == st.num_modules - 1)
            xs, m_ns = _module_apply(p[f"stage{name}"][mi], s[f"stage{name}"][mi],
                                     xs, scaled, mso, train=train, policy=policy)
            mods_ns.append(m_ns)
        ns[f"stage{name}"] = mods_ns
        return xs

    y_list = run_stage("2", spec.stage2, x_list)

    x_list, t_ns = [], []
    for i, src in enumerate((y_list[-2], y_list[-1], taps[3])):
        z, n = trans("trans2", i, src)
        x_list.append(z)
        t_ns.append(n)
    ns_t["trans2"] = t_ns
    y_list = run_stage("3", spec.stage3, x_list)

    x_list, t_ns = [], []
    for i, src in enumerate((y_list[-3], y_list[-2], y_list[-1], taps[4])):
        z, n = trans("trans3", i, src)
        x_list.append(z)
        t_ns.append(n)
    ns_t["trans3"] = t_ns
    y_list = run_stage("4", spec.stage4, x_list)
    ns.update(ns_t)

    final_outputs = []
    feat = y_list[0]
    kf = spec.final_conv_kernel
    out = L.conv(p["final"][0], feat, padding=kf // 2, policy=policy)
    out = out + p["final"][0]["b"].astype(out.dtype)
    final_outputs.append(out.astype(jnp.float32))
    dec_ns = []
    for i in range(spec.num_deconvs):
        if spec.cat_output[i]:
            feat = jnp.concatenate([feat, out.astype(feat.dtype)], axis=-1)
        pad, opad = _deconv_cfg(spec.deconv_kernels[i])
        z = L.deconv(p["deconv"][i]["deconv"], feat, torch_padding=pad, output_padding=opad, policy=policy)
        z, nb = L.batch_norm(p["deconv"][i]["bn"], s["deconv"][i]["bn"], z, train)
        z = L.relu(z)
        blocks_ns = []
        for k in range(spec.deconv_num_basic_blocks):
            z, n = _basic(p["deconv"][i]["blocks"][k], s["deconv"][i]["blocks"][k], z,
                          train=train, policy=policy)
            blocks_ns.append(n)
        dec_ns.append({"bn": nb, "blocks": blocks_ns})
        feat = z
        out = L.conv(p["final"][i + 1], feat, padding=kf // 2, policy=policy)
        out = out + p["final"][i + 1]["b"].astype(out.dtype)
        final_outputs.append(out.astype(jnp.float32))
    ns["deconv"] = dec_ns
    return final_outputs, ns


# jit + persistent-cache the init graph (see layers.jit_init)
init_efficient_hrnet = L.jit_init(init_efficient_hrnet, ("spec",))

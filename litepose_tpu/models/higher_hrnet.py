"""HigherHRNet baseline (functional NHWC reimplementation).

Baseline model for comparisons and as the pretrain/teacher source
(reference: ``/root/reference/lib/models/pose_higher_hrnet.py``):

  stem: two stride-2 3x3 convs to 64ch (:265-272);
  layer1: 4 ResNet Bottlenecks (STEM_INPLANES -> x4) (:431-446);
  stages 2-4: multi-resolution HighResolutionModules with BASIC blocks,
  nearest-upsample / strided-conv fusion (:107-248); the gradual-shrinking
  variants use NUM_BLOCKS=0 branches that reduce to a convbnrelu (:158-160);
  head: final 1x1 conv + NUM_DECONVS transposed-conv stages with optional
  CAT_OUTPUT concatenation of the previous prediction (:346-417, forward
  :479-525).

Outputs: [heatmaps+tags @ 1/4, heatmaps(+tags) @ 1/2] — same contract as
LitePose, so the whole inference/decode/eval stack is shared.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from .layers import DEFAULT_POLICY, Policy
from .litepose import _deconv_cfg


class StageSpec(NamedTuple):
    num_modules: int
    num_branches: int
    block: str  # 'BASIC' | 'BOTTLENECK'
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]


class HRNetSpec(NamedTuple):
    num_joints: int = 14
    tag_per_joint: bool = True
    with_ae_loss: Tuple[bool, ...] = (True, False)
    stem_inplanes: int = 64
    final_conv_kernel: int = 1
    stage2: StageSpec = StageSpec(1, 2, "BASIC", (4, 4), (32, 64))
    stage3: StageSpec = StageSpec(4, 3, "BASIC", (4, 4, 4), (32, 64, 128))
    stage4: StageSpec = StageSpec(3, 4, "BASIC", (4, 4, 4, 4), (32, 64, 128, 256))
    num_deconvs: int = 1
    deconv_channels: Tuple[int, ...] = (32,)
    deconv_kernels: Tuple[int, ...] = (4,)
    deconv_num_basic_blocks: int = 4
    cat_output: Tuple[bool, ...] = (True,)

    @staticmethod
    def from_config(cfg) -> "HRNetSpec":
        e = cfg.MODEL.EXTRA

        def stage(s):
            return StageSpec(
                s.NUM_MODULES, s.NUM_BRANCHES, s.BLOCK,
                tuple(s.NUM_BLOCKS), tuple(s.NUM_CHANNELS),
            )

        return HRNetSpec(
            num_joints=cfg.MODEL.NUM_JOINTS,
            tag_per_joint=cfg.MODEL.TAG_PER_JOINT,
            with_ae_loss=tuple(cfg.LOSS.WITH_AE_LOSS),
            stem_inplanes=e.STEM_INPLANES,
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

    def expansion(self, block: str) -> int:
        return 4 if block == "BOTTLENECK" else 1

    def final_out_channels(self, idx: int) -> int:
        dim_tag = self.num_joints if self.tag_per_joint else 1
        return self.num_joints + (dim_tag if self.with_ae_loss[idx] else 0)


# -- primitive HRNet blocks --------------------------------------------------


def _convbn_init(key, cin, cout, k=3):
    p = L.conv_init(key, k, cin, cout)
    bp, bs = L.bn_init(cout)
    return {"conv": p, "bn": bp}, {"bn": bs}


def _convbn(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY, relu=True,
            relu6=False):
    y = L.conv(p["conv"], x, stride=stride, policy=policy)
    y, ns = L.batch_norm(p["bn"], s["bn"], y, train)
    if relu6:
        y = L.relu6(y)
    elif relu:
        y = L.relu(y)
    return y, {"bn": ns}


def _basic_init(key, cin, cout, stride=1):
    k1, k2, k3 = jax.random.split(key, 3)
    p1, s1 = _convbn_init(k1, cin, cout)
    p2, s2 = _convbn_init(k2, cout, cout)
    params = {"c1": p1, "c2": p2}
    state = {"c1": s1, "c2": s2}
    if stride != 1 or cin != cout:
        pd, sd = _convbn_init(k3, cin, cout, k=1)
        params["down"] = pd
        state["down"] = sd
    return params, state


def _basic(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY):
    y, n1 = _convbn(p["c1"], s["c1"], x, stride=stride, train=train, policy=policy)
    y, n2 = _convbn(p["c2"], s["c2"], y, train=train, policy=policy, relu=False)
    ns = {"c1": n1, "c2": n2}
    res = x
    if "down" in p:
        res, nd = _convbn(p["down"], s["down"], x, stride=stride, train=train, policy=policy, relu=False)
        ns["down"] = nd
    return L.relu(y + res), ns


def _bottleneck_init(key, cin, planes, stride=1):
    cout = planes * 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p1, s1 = _convbn_init(k1, cin, planes, k=1)
    p2, s2 = _convbn_init(k2, planes, planes, k=3)
    p3, s3 = _convbn_init(k3, planes, cout, k=1)
    params = {"c1": p1, "c2": p2, "c3": p3}
    state = {"c1": s1, "c2": s2, "c3": s3}
    if stride != 1 or cin != cout:
        pd, sd = _convbn_init(k4, cin, cout, k=1)
        params["down"] = pd
        state["down"] = sd
    return params, state


def _bottleneck(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY):
    y, n1 = _convbn(p["c1"], s["c1"], x, train=train, policy=policy)
    y, n2 = _convbn(p["c2"], s["c2"], y, stride=stride, train=train, policy=policy)
    y, n3 = _convbn(p["c3"], s["c3"], y, train=train, policy=policy, relu=False)
    ns = {"c1": n1, "c2": n2, "c3": n3}
    res = x
    if "down" in p:
        res, nd = _convbn(p["down"], s["down"], x, stride=stride, train=train, policy=policy, relu=False)
        ns["down"] = nd
    return L.relu(y + res), ns


def _upsample_nearest(x, factor: int):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


# -- HighResolutionModule -----------------------------------------------------


def _module_init(key, spec: StageSpec, in_channels: List[int], exp: int,
                 multi_scale_output: bool):
    keys = iter(jax.random.split(key, 512))
    params: dict = {"branches": [], "fuse": []}
    state: dict = {"branches": [], "fuse": []}
    out_channels = list(in_channels)
    for bi in range(spec.num_branches):
        cout = spec.num_channels[bi] * exp
        if spec.num_blocks[bi] == 0:
            # gradual-shrinking variant: a single convbnrelu branch
            bp, bs = _convbn_init(next(keys), in_channels[bi], spec.num_channels[bi])
            params["branches"].append({"cbr": bp})
            state["branches"].append({"cbr": bs})
            out_channels[bi] = spec.num_channels[bi]
            continue
        blocks_p, blocks_s = [], []
        cin = in_channels[bi]
        for k in range(spec.num_blocks[bi]):
            if spec.block == "BOTTLENECK":
                bp, bs = _bottleneck_init(next(keys), cin, spec.num_channels[bi])
            else:
                bp, bs = _basic_init(next(keys), cin, cout)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = cout
        params["branches"].append({"blocks": blocks_p})
        state["branches"].append({"blocks": blocks_s})
        out_channels[bi] = cout

    n_out = spec.num_branches if multi_scale_output else 1
    for i in range(n_out):
        row_p, row_s = [], []
        for j in range(spec.num_branches):
            if j > i:
                pp, ss = _convbn_init(next(keys), out_channels[j], out_channels[i], k=1)
                row_p.append({"up": pp})
                row_s.append({"up": ss})
            elif j == i:
                row_p.append(None)
                row_s.append(None)
            else:
                chain_p, chain_s = [], []
                for k in range(i - j):
                    cout_f = out_channels[i] if k == i - j - 1 else out_channels[j]
                    pp, ss = _convbn_init(next(keys), out_channels[j], cout_f)
                    chain_p.append(pp)
                    chain_s.append(ss)
                row_p.append({"down": chain_p})
                row_s.append({"down": chain_s})
        params["fuse"].append(row_p)
        state["fuse"].append(row_s)
    return params, state, out_channels


def _module_apply(p, s, xs, spec: StageSpec, multi_scale_output: bool,
                  train=False, policy=DEFAULT_POLICY):
    ns: dict = {"branches": [], "fuse": []}
    ys = []
    for bi in range(spec.num_branches):
        bp, bs = p["branches"][bi], s["branches"][bi]
        if "cbr" in bp:
            # reference 0-block branches use convbnrelu == ReLU6 (layers.py:18-24)
            y, n = _convbn(bp["cbr"], bs["cbr"], xs[bi], train=train, policy=policy, relu6=True)
            ns["branches"].append({"cbr": n})
            ys.append(y)
            continue
        y = xs[bi]
        blocks_ns = []
        for k in range(spec.num_blocks[bi]):
            if spec.block == "BOTTLENECK":
                y, n = _bottleneck(bp["blocks"][k], bs["blocks"][k], y, train=train, policy=policy)
            else:
                y, n = _basic(bp["blocks"][k], bs["blocks"][k], y, train=train, policy=policy)
            blocks_ns.append(n)
        ns["branches"].append({"blocks": blocks_ns})
        ys.append(y)

    if spec.num_branches == 1:
        ns["fuse"] = s["fuse"]
        return ys, ns

    fused = []
    for i in range(len(p["fuse"])):
        row_ns = []
        acc = None
        for j in range(spec.num_branches):
            e_p, e_s = p["fuse"][i][j], s["fuse"][i][j]
            if j == i:
                contrib = ys[j]
                row_ns.append(None)
            elif j > i:
                z, n = _convbn(e_p["up"], e_s["up"], ys[j], train=train, policy=policy, relu=False)
                contrib = _upsample_nearest(z, 2 ** (j - i))
                row_ns.append({"up": n})
            else:
                z = ys[j]
                chain_ns = []
                for k in range(i - j):
                    last = k == i - j - 1
                    z, n = _convbn(
                        e_p["down"][k], e_s["down"][k], z, stride=2,
                        train=train, policy=policy, relu=not last,
                    )
                    chain_ns.append(n)
                contrib = z
                row_ns.append({"down": chain_ns})
            acc = contrib if acc is None else acc + contrib
        fused.append(L.relu(acc))
        ns["fuse"].append(row_ns)
    return fused, ns


# -- full network --------------------------------------------------------------


def init_higher_hrnet(key, spec: HRNetSpec):
    keys = iter(jax.random.split(key, 2048))
    params: dict = {}
    state: dict = {}

    p1, s1 = _convbn_init(next(keys), 3, 64)
    p2, s2 = _convbn_init(next(keys), 64, 64)
    params["stem"] = {"c1": p1, "c2": p2}
    state["stem"] = {"c1": s1, "c2": s2}

    # layer1: 4 bottlenecks
    blocks_p, blocks_s = [], []
    cin = 64
    for k in range(4):
        bp, bs = _bottleneck_init(next(keys), cin, spec.stem_inplanes)
        blocks_p.append(bp)
        blocks_s.append(bs)
        cin = spec.stem_inplanes * 4
    params["layer1"] = blocks_p
    state["layer1"] = blocks_s

    def transition_init(key2, pre: List[int], cur: List[int]):
        tkeys = iter(jax.random.split(key2, 64))
        t_p, t_s = [], []
        for i in range(len(cur)):
            if i < len(pre):
                if cur[i] != pre[i]:
                    pp, ss = _convbn_init(next(tkeys), pre[i], cur[i])
                    t_p.append({"cbr": pp})
                    t_s.append({"cbr": ss})
                else:
                    t_p.append(None)
                    t_s.append(None)
            else:
                chain_p, chain_s = [], []
                for j in range(i + 1 - len(pre)):
                    cin_t = pre[-1]
                    cout_t = cur[i] if j == i - len(pre) else cin_t
                    pp, ss = _convbn_init(next(tkeys), cin_t, cout_t)
                    chain_p.append(pp)
                    chain_s.append(ss)
                t_p.append({"down": chain_p})
                t_s.append({"down": chain_s})
        return t_p, t_s

    pre = [spec.stem_inplanes * 4]
    for name, st in (("2", spec.stage2), ("3", spec.stage3), ("4", spec.stage4)):
        exp = spec.expansion(st.block)
        cur = [c * exp for c in st.num_channels]
        tp, tsd = transition_init(next(keys), pre, cur)
        params[f"transition{name}"] = tp
        state[f"transition{name}"] = tsd
        mods_p, mods_s = [], []
        chans = list(cur)
        last_stage = name == "4"
        for mi in range(st.num_modules):
            mso = not (last_stage and mi == st.num_modules - 1)
            mp, ms, chans = _module_init(next(keys), st, chans, exp, mso)
            mods_p.append(mp)
            mods_s.append(ms)
        params[f"stage{name}"] = mods_p
        state[f"stage{name}"] = mods_s
        pre = chans

    # heads
    input_channels = pre[0]
    finals = []
    fin = input_channels
    for i in range(spec.num_deconvs + 1):
        cout = spec.final_out_channels(i)
        k = spec.final_conv_kernel
        cin_f = fin if i == 0 else spec.deconv_channels[i - 1]
        w = L.conv_init(next(keys), k, cin_f, cout)
        w["b"] = jnp.zeros((cout,))
        finals.append(w)
    params["final"] = finals

    deconvs_p, deconvs_s = [], []
    cin_d = input_channels
    for i in range(spec.num_deconvs):
        if spec.cat_output[i]:
            cin_d += spec.final_out_channels(i)
        cout = spec.deconv_channels[i]
        dp = {"deconv": L.deconv_init(next(keys), spec.deconv_kernels[i], cin_d, cout)}
        bp, bs = L.bn_init(cout)
        dp["bn"] = bp
        ds = {"bn": bs}
        blocks_p, blocks_s = [], []
        for _ in range(spec.deconv_num_basic_blocks):
            bbp, bbs = _basic_init(next(keys), cout, cout)
            blocks_p.append(bbp)
            blocks_s.append(bbs)
        dp["blocks"] = blocks_p
        ds["blocks"] = blocks_s
        deconvs_p.append(dp)
        deconvs_s.append(ds)
        cin_d = cout
    params["deconv"] = deconvs_p
    state["deconv"] = deconvs_s
    return params, state


def apply_higher_hrnet(params, state, x, spec: HRNetSpec, train=False,
                       policy: Policy = DEFAULT_POLICY):
    p, s = params, state
    ns: dict = {}
    y, n1 = _convbn(p["stem"]["c1"], s["stem"]["c1"], x, stride=2, train=train, policy=policy)
    y, n2 = _convbn(p["stem"]["c2"], s["stem"]["c2"], y, stride=2, train=train, policy=policy)
    ns["stem"] = {"c1": n1, "c2": n2}

    l1_ns = []
    for k in range(4):
        y, n = _bottleneck(p["layer1"][k], s["layer1"][k], y, train=train, policy=policy)
        l1_ns.append(n)
    ns["layer1"] = l1_ns

    def apply_transition(tp, tsd, prev_list):
        outs, t_ns = [], []
        for i in range(len(tp)):
            if tp[i] is None:
                outs.append(prev_list[i] if i < len(prev_list) else prev_list[-1])
                t_ns.append(None)
            elif "cbr" in tp[i]:
                # reference applies non-None transitions to the LAST branch
                # output (forward :489-501)
                z, n = _convbn(tp[i]["cbr"], tsd[i]["cbr"], prev_list[-1], train=train, policy=policy)
                outs.append(z)
                t_ns.append({"cbr": n})
            else:
                z = prev_list[-1]
                chain_ns = []
                for j in range(len(tp[i]["down"])):
                    z, n = _convbn(tp[i]["down"][j], tsd[i]["down"][j], z, stride=2, train=train, policy=policy)
                    chain_ns.append(n)
                outs.append(z)
                t_ns.append({"down": chain_ns})
        return outs, t_ns

    ys = [y]
    for name, st in (("2", spec.stage2), ("3", spec.stage3), ("4", spec.stage4)):
        ys, t_ns = apply_transition(p[f"transition{name}"], s[f"transition{name}"], ys)
        ns[f"transition{name}"] = t_ns
        mods_ns = []
        last_stage = name == "4"
        for mi in range(st.num_modules):
            mso = not (last_stage and mi == st.num_modules - 1)
            ys, m_ns = _module_apply(
                p[f"stage{name}"][mi], s[f"stage{name}"][mi], ys, st, mso,
                train=train, policy=policy,
            )
            mods_ns.append(m_ns)
        ns[f"stage{name}"] = mods_ns

    final_outputs = []
    feat = ys[0]
    k_final = spec.final_conv_kernel
    out = L.conv(p["final"][0], feat, padding=k_final // 2, policy=policy)
    out = out + p["final"][0]["b"].astype(out.dtype)
    final_outputs.append(out.astype(jnp.float32))

    deconv_ns = []
    for i in range(spec.num_deconvs):
        if spec.cat_output[i]:
            feat = jnp.concatenate([feat, out.astype(feat.dtype)], axis=-1)
        pad, opad = _deconv_cfg(spec.deconv_kernels[i])
        z = L.deconv(p["deconv"][i]["deconv"], feat, torch_padding=pad, output_padding=opad, policy=policy)
        z, nbn = L.batch_norm(p["deconv"][i]["bn"], s["deconv"][i]["bn"], z, train)
        z = L.relu(z)
        blocks_ns = []
        for k in range(spec.deconv_num_basic_blocks):
            z, n = _basic(p["deconv"][i]["blocks"][k], s["deconv"][i]["blocks"][k], z, train=train, policy=policy)
            blocks_ns.append(n)
        deconv_ns.append({"bn": nbn, "blocks": blocks_ns})
        feat = z
        out = L.conv(p["final"][i + 1], feat, padding=k_final // 2, policy=policy)
        out = out + p["final"][i + 1]["b"].astype(out.dtype)
        final_outputs.append(out.astype(jnp.float32))
    ns["deconv"] = deconv_ns
    return final_outputs, ns


# jit + persistent-cache the init graph (see layers.jit_init)
init_higher_hrnet = L.jit_init(init_higher_hrnet, ("spec",))

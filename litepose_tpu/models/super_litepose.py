"""SuperLitePose: one-shot NAS weight-sharing supernet, TPU-native.

The reference supernet selects sub-networks by *slicing* leading channels of
every weight at forward time (``/root/reference/lib/models/layers/
super_layers.py``) — dynamic shapes, one graph per sample.  On TPU we
instead compute at **max width with channel masking**: the sampled arch is
encoded as a small integer vector of active-channel counts that is a traced
argument, so ONE compiled step serves every arch in the space (only the
elastic input resolution changes the compiled shape).

Equivalences with the slicing formulation (verified in tests):
  * conv of a zero-masked input == conv of the sliced input (inactive input
    channels contribute nothing); masking the output == slicing out-channels;
  * masked BatchNorm: per-channel batch statistics of active channels are
    unchanged by other channels' presence; inactive channels are re-masked
    after the affine (else the bias would leak) and their running stats are
    left untouched (``SuperBatchNorm2d`` slices stats, super_layers.py:19-28);
  * ``mid_dim = round(active_in * expansion)`` — the expanded-feature mask
    is derived from the active input width (super_layers.py:167);
  * kernel elasticity: center-crop the 7x7 depthwise kernel to 5/3 and apply
    a learned dense transform (``Linear5x5``/``Linear3x3``,
    super_layers.py:171-184).  Kernel size is static per compiled step.

Sub-network extraction (``weight transfer``) and channel re-organization by
L1 importance (``re_organize_weights``,
``/root/reference/lib/models/pose_supermobilenet.py:167-196``) become pure
pytree transforms — see ``extract_subnet`` / ``reorganize_weights``.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..arch.manager import ArchManager
from ..arch.schema import ArchConfig, make_divisible
from . import layers as L
from .layers import DEFAULT_POLICY, Policy
from .litepose import STEM_CHANNELS, ModelSpec, _deconv_cfg


# --------------------------------------------------------------------------
# arch descriptor <-> mask vector
# --------------------------------------------------------------------------


class SuperDims(NamedTuple):
    """Static maximal dimensions of the supernet (from the search space)."""

    input_channel: int
    stage_channels: Tuple[int, ...]  # per stage
    stage_blocks: Tuple[int, ...]
    stage_strides: Tuple[int, ...]
    deconv: Tuple[int, ...]
    kernel: int = 7
    expansion: int = 6

    @staticmethod
    def from_manager(m: ArchManager) -> "SuperDims":
        return SuperDims(
            input_channel=m.input_channel,
            stage_channels=tuple(c for c, _, _ in m.stage_setting),
            stage_blocks=tuple(n for _, n, _ in m.stage_setting),
            stage_strides=tuple(s for _, _, s in m.stage_setting),
            deconv=tuple(m.deconv_setting),
        )

    def block_in_max(self, si: int, bi: int) -> int:
        if bi == 0:
            return self.input_channel if si == 0 else self.stage_channels[si - 1]
        return self.stage_channels[si]

    def feat_max(self, si: int, bi: int) -> int:
        # reference supernet: feature_dim = round(inplanes * expansion)
        # (pose_supermobilenet.py:145) — no divisibility rounding.
        return round(self.block_in_max(si, bi) * self.expansion)


def arch_to_mask_desc(arch: ArchConfig, manager: ArchManager) -> jnp.ndarray:
    """Pack active-channel counts into a flat int32 vector:
    [input_channel, stage_channels(4), deconv(3)]."""
    vals = [arch.input_channel]
    vals += [st.channel for st in arch.backbone_setting]
    vals += list(arch.deconv_setting)
    return jnp.asarray(vals, jnp.int32)


def _mask(n_active, width: int) -> jnp.ndarray:
    return (jnp.arange(width) < n_active).astype(jnp.float32)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def init_super_litepose(key, spec: ModelSpec, dims: SuperDims):
    """Initialize supernet (params, state) at maximal widths."""
    keys = iter(jax.random.split(key, 4096))
    params: dict = {}
    state: dict = {}

    p0, s0 = L.convbnrelu_init(next(keys), 3, STEM_CHANNELS, k=3)
    p1, s1 = L.convbnrelu_init(next(keys), STEM_CHANNELS, STEM_CHANNELS, k=3, groups=STEM_CHANNELS)
    p2 = L.conv_init(next(keys), 1, STEM_CHANNELS, dims.input_channel)
    pb, sb = L.bn_init(dims.input_channel)
    params["first"] = {"cbr0": p0, "cbr1": p1, "conv2": p2, "bn2": pb}
    state["first"] = {"cbr0": s0, "cbr1": s1, "bn2": sb}

    stages_p, stages_s = [], []
    for si, (c, n, s) in enumerate(zip(dims.stage_channels, dims.stage_blocks, dims.stage_strides)):
        blocks_p, blocks_s = [], []
        for bi in range(n):
            cin = dims.block_in_max(si, bi)
            feat = dims.feat_max(si, bi)
            k1, k2, k3, k4, k5 = jax.random.split(next(keys), 5)
            bp = {
                "inv": {"conv": L.conv_init(k1, 1, cin, feat)},
                "depth": {"conv": L.conv_init(k2, dims.kernel, feat, feat, groups=feat)},
                "point": {"conv": L.conv_init(k3, 1, feat, c)},
                # learned kernel transforms for 7->5 / 7->3 elasticity
                "lin5": {
                    "w": jax.random.normal(k4, (25, 25)) * 0.01 + jnp.eye(25),
                    "b": jnp.zeros((25,)),
                },
                "lin3": {
                    "w": jax.random.normal(k5, (9, 9)) * 0.01 + jnp.eye(9),
                    "b": jnp.zeros((9,)),
                },
            }
            bs = {}
            for name, width in (("inv", feat), ("depth", feat), ("point", c)):
                pbn, sbn = L.bn_init(width)
                bp[name]["bn"] = pbn
                bs[name] = {"bn": sbn}
            blocks_p.append(bp)
            blocks_s.append(bs)
        stages_p.append(blocks_p)
        stages_s.append(blocks_s)
    params["stage"] = stages_p
    state["stage"] = stages_s

    channels = [dims.input_channel] + list(dims.stage_channels)
    inplanes = channels[-1]
    dr, dw, dbn_p, dbn_s = [], [], [], []
    for i in range(spec.num_deconv_layers):
        kd = spec.deconv_kernels[i]
        dr.append(L.deconv_init(next(keys), kd, inplanes, dims.deconv[i]))
        dw.append(L.deconv_init(next(keys), kd, channels[-i - 2], dims.deconv[i]))
        pbn, sbn = L.bn_init(dims.deconv[i])
        dbn_p.append(pbn)
        dbn_s.append(sbn)
        inplanes = dims.deconv[i]
    params["deconv_refined"] = dr
    params["deconv_raw"] = dw
    params["deconv_bn"] = dbn_p
    state["deconv_bn"] = dbn_s

    fr_p, fr_s, fw_p, fw_s = [], [], [], []
    for i, cout in enumerate(spec.final_channels(), start=1):
        pr, sr = L.sepconv_init(next(keys), dims.deconv[i], cout, ker=5)
        fr_p.append(pr)
        fr_s.append(sr)
        pw, sw = L.sepconv_init(next(keys), channels[-i - 3], cout, ker=5)
        fw_p.append(pw)
        fw_s.append(sw)
    params["final_refined"] = fr_p
    state["final_refined"] = fr_s
    params["final_raw"] = fw_p
    state["final_raw"] = fw_s
    return params, state


# --------------------------------------------------------------------------
# masked primitives
# --------------------------------------------------------------------------


def masked_bn(p, s, x, mask, train: bool):
    """BN whose running statistics only update (and whose output only
    exists) on active channels."""
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": jnp.where(mask > 0, (1 - L.BN_MOMENTUM) * s["mean"] + L.BN_MOMENTUM * mean, s["mean"]),
            "var": jnp.where(mask > 0, (1 - L.BN_MOMENTUM) * s["var"] + L.BN_MOMENTUM * unbiased, s["var"]),
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var + L.BN_EPS) * p["scale"]
    y = ((x32 - mean) * inv + p["bias"]) * mask
    return y.astype(x.dtype), new_state


def _masked_conv(p, x, out_mask, stride=1, groups=1, policy=DEFAULT_POLICY):
    y = L.conv(p, x, stride=stride, groups=groups, policy=policy)
    return y * out_mask.astype(y.dtype)


def super_inv_bottleneck(
    bp, bs, x, in_n, out_n, out_max: int, feat_max: int, expansion: int,
    stride: int, residual: bool, kernel: int = 7, max_kernel: int = 7,
    train: bool = False, policy: Policy = DEFAULT_POLICY,
):
    """Masked inverted residual with elastic width and kernel."""
    feat_n = in_n * expansion  # round() is exact for integer widths
    feat_mask = _mask(feat_n, feat_max)
    out_mask = _mask(out_n, out_max)

    y = _masked_conv(bp["inv"]["conv"], x, feat_mask, policy=policy)
    y, s1 = masked_bn(bp["inv"]["bn"], bs["inv"]["bn"], y, feat_mask, train)
    y = L.relu6(y)

    w = bp["depth"]["conv"]["w"]  # (7,7,1,featmax) HWIO
    if kernel < max_kernel:
        lo = max_kernel // 2 - kernel // 2
        hi = max_kernel // 2 + kernel // 2 + 1
        wc = w[lo:hi, lo:hi]  # (k,k,1,C)
        flat = wc.reshape(kernel * kernel, -1)  # (k*k, C)
        lin = bp["lin5"] if kernel == 5 else bp["lin3"]
        # torch Linear on the flattened kernel: y = W @ flat + b
        flat = lin["w"] @ flat + lin["b"][:, None]
        w = flat.reshape(kernel, kernel, 1, w.shape[-1])
    # isolate at eval: stops XLA fusing the expand conv into this depthwise
    # conv's operand fusion with real BN/bias values (see layers.conv)
    y = L.conv({"w": w}, y, stride=stride, groups=w.shape[-1], policy=policy,
               isolate=not train)
    y = y * feat_mask.astype(y.dtype)
    y, s2 = masked_bn(bp["depth"]["bn"], bs["depth"]["bn"], y, feat_mask, train)
    y = L.relu6(y)

    y = _masked_conv(bp["point"]["conv"], y, out_mask, policy=policy)
    y, s3 = masked_bn(bp["point"]["bn"], bs["point"]["bn"], y, out_mask, train)
    if residual:
        y = y + x
    return y, {"inv": {"bn": s1}, "depth": {"bn": s2}, "point": {"bn": s3}}


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def apply_super_litepose(
    params, state, x, mask_desc, spec: ModelSpec, dims: SuperDims,
    kernels: Optional[Sequence[Sequence[int]]] = None,
    train: bool = False, policy: Policy = DEFAULT_POLICY,
):
    """Forward with a sampled sub-architecture.

    mask_desc: int32 vector [input_channel, c0..c3, d0..d2] (traced — one
    compiled graph covers the whole width space).
    kernels: optional static per-stage per-block kernel sizes (default 7).
    """
    p, s = params, state
    ns: dict = {"stage": [], "deconv_bn": [], "final_refined": [], "final_raw": []}
    in_n = mask_desc[0]
    stage_n = [mask_desc[1 + i] for i in range(len(dims.stage_channels))]
    deconv_n = [mask_desc[5 + i] for i in range(len(dims.deconv))]

    y, n0 = L.convbnrelu_apply(p["first"]["cbr0"], s["first"]["cbr0"], x, stride=2, train=train, policy=policy)
    y, n1 = L.convbnrelu_apply(p["first"]["cbr1"], s["first"]["cbr1"], y, groups=STEM_CHANNELS, train=train, policy=policy)
    stem_mask = _mask(in_n, dims.input_channel)
    y = _masked_conv(p["first"]["conv2"], y, stem_mask, policy=policy)
    y, nb = masked_bn(p["first"]["bn2"], s["first"]["bn2"], y, stem_mask, train)
    ns["first"] = {"cbr0": n0, "cbr1": n1, "bn2": nb}

    x_list = [y]
    cur_n = in_n
    for si in range(len(dims.stage_channels)):
        blocks_ns = []
        for bi in range(dims.stage_blocks[si]):
            stride = dims.stage_strides[si] if bi == 0 else 1
            residual = bi > 0  # in-stage blocks share the stage width
            k = 7 if kernels is None else kernels[si][bi]
            y, bn = super_inv_bottleneck(
                p["stage"][si][bi], s["stage"][si][bi], y,
                in_n=cur_n, out_n=stage_n[si],
                out_max=dims.stage_channels[si], feat_max=dims.feat_max(si, bi),
                expansion=dims.expansion, stride=stride, residual=residual,
                kernel=k, max_kernel=dims.kernel, train=train, policy=policy,
            )
            blocks_ns.append(bn)
            cur_n = stage_n[si]
        ns["stage"].append(blocks_ns)
        x_list.append(y)

    final_outputs = []
    input_refined = x_list[-1]
    input_raw = x_list[-2]
    for i in range(spec.num_deconv_layers):
        kd = spec.deconv_kernels[i]
        pad, opad = _deconv_cfg(kd)
        d_mask = _mask(deconv_n[i], dims.deconv[i])
        nxt = L.deconv(p["deconv_refined"][i], input_refined, torch_padding=pad, output_padding=opad, policy=policy)
        nxt = nxt + L.deconv(p["deconv_raw"][i], input_raw, torch_padding=pad, output_padding=opad, policy=policy)
        nxt = nxt * d_mask.astype(nxt.dtype)
        yb, nb = masked_bn(p["deconv_bn"][i], s["deconv_bn"][i], nxt, d_mask, train)
        input_refined = L.relu(yb)
        ns["deconv_bn"].append(nb)
        input_raw = x_list[-i - 3]
        if i > 0:
            out, nr = L.sepconv_apply(
                p["final_refined"][i - 1], s["final_refined"][i - 1], input_refined, train=train, policy=policy
            )
            out_raw, nw = L.sepconv_apply(
                p["final_raw"][i - 1], s["final_raw"][i - 1], input_raw, train=train, policy=policy
            )
            ns["final_refined"].append(nr)
            ns["final_raw"].append(nw)
            final_outputs.append((out + out_raw).astype(jnp.float32))
    return final_outputs, ns


# --------------------------------------------------------------------------
# sub-network extraction (the reference weight_transfer.py as a pytree op)
# --------------------------------------------------------------------------


def extract_subnet(super_params, super_state, arch: ArchConfig, dims: SuperDims,
                   spec: ModelSpec):
    """Slice leading channels of every supernet tensor into a fixed-subnet
    (params, state) matching ``init_litepose(spec, arch)`` — the reference
    ``weight_transfer.py:75-146`` as a pure function."""

    def conv_slice(p, cin, cout):
        return {"w": p["w"][:, :, :cin, :cout]}

    def dw_slice(p, c, kernel, lin5=None, lin3=None, max_kernel=7):
        w = p["w"]
        if kernel < max_kernel:
            lo = max_kernel // 2 - kernel // 2
            hi = max_kernel // 2 + kernel // 2 + 1
            wc = w[lo:hi, lo:hi]
            flat = wc.reshape(kernel * kernel, -1)
            lin = lin5 if kernel == 5 else lin3
            flat = lin["w"] @ flat + lin["b"][:, None]
            w = flat.reshape(kernel, kernel, 1, w.shape[-1])
        return {"w": w[:, :, :, :c]}

    def bn_slice(pp, ss, c):
        return (
            {"scale": pp["scale"][:c], "bias": pp["bias"][:c]},
            {"mean": ss["mean"][:c], "var": ss["var"][:c]},
        )

    params: dict = {}
    state: dict = {}
    ic = arch.input_channel
    pb, sb = bn_slice(super_params["first"]["bn2"], super_state["first"]["bn2"], ic)
    params["first"] = {
        "cbr0": super_params["first"]["cbr0"],
        "cbr1": super_params["first"]["cbr1"],
        "conv2": conv_slice(super_params["first"]["conv2"], STEM_CHANNELS, ic),
        "bn2": pb,
    }
    state["first"] = {
        "cbr0": super_state["first"]["cbr0"],
        "cbr1": super_state["first"]["cbr1"],
        "bn2": sb,
    }

    stages_p, stages_s = [], []
    cin = ic
    for si, st in enumerate(arch.backbone_setting):
        blocks_p, blocks_s = [], []
        for bi in range(st.num_blocks):
            t, k = st.block_setting[bi]
            feat = round(cin * t)
            sp = super_params["stage"][si][bi]
            ssb = super_state["stage"][si][bi]
            bp: dict = {
                "inv": {"conv": conv_slice(sp["inv"]["conv"], cin, feat)},
                "depth": {
                    "conv": dw_slice(sp["depth"]["conv"], feat, k, sp.get("lin5"), sp.get("lin3"), dims.kernel)
                },
                "point": {"conv": conv_slice(sp["point"]["conv"], feat, st.channel)},
            }
            bs: dict = {}
            for name, width in (("inv", feat), ("depth", feat), ("point", st.channel)):
                pbn, sbn = bn_slice(sp[name]["bn"], ssb[name]["bn"], width)
                bp[name]["bn"] = pbn
                bs[name] = {"bn": sbn}
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = st.channel
        stages_p.append(blocks_p)
        stages_s.append(blocks_s)
    params["stage"] = stages_p
    state["stage"] = stages_s

    channels = list(arch.stage_channels)
    filters = arch.deconv_setting
    inplanes = channels[-1]
    dr, dw_, dbn_p, dbn_s = [], [], [], []
    for i in range(spec.num_deconv_layers):
        raw_c = channels[-i - 2]
        dr.append({"w": super_params["deconv_refined"][i]["w"][:, :, :inplanes, : filters[i]]})
        dw_.append({"w": super_params["deconv_raw"][i]["w"][:, :, :raw_c, : filters[i]]})
        pbn, sbn = bn_slice(super_params["deconv_bn"][i], super_state["deconv_bn"][i], filters[i])
        dbn_p.append(pbn)
        dbn_s.append(sbn)
        inplanes = filters[i]
    params["deconv_refined"] = dr
    params["deconv_raw"] = dw_
    params["deconv_bn"] = dbn_p
    state["deconv_bn"] = dbn_s

    fr_p, fr_s, fw_p, fw_s = [], [], [], []
    for i, cout in enumerate(spec.final_channels(), start=1):
        for src_p, src_s, cin_f, accum_p, accum_s in (
            (super_params["final_refined"][i - 1], super_state["final_refined"][i - 1], filters[i], fr_p, fr_s),
            (super_params["final_raw"][i - 1], super_state["final_raw"][i - 1], channels[-i - 3], fw_p, fw_s),
        ):
            pbn, sbn = bn_slice(src_p["dw"]["bn"], src_s["dw"]["bn"], cin_f)
            accum_p.append(
                {
                    "dw": {"conv": {"w": src_p["dw"]["conv"]["w"][:, :, :, :cin_f]}, "bn": pbn},
                    "pw": {"conv": {"w": src_p["pw"]["conv"]["w"][:, :, :cin_f, :cout]}},
                }
            )
            accum_s.append({"dw": {"bn": sbn}})
    params["final_refined"] = fr_p
    state["final_refined"] = fr_s
    params["final_raw"] = fw_p
    state["final_raw"] = fw_s
    return params, state


def inject_subnet(super_params, super_state, params, state, arch: ArchConfig,
                  dims: SuperDims, spec: ModelSpec):
    """Write a fixed-subnet (params, state) into the LEADING channel slices
    of a supernet — the exact inverse of :func:`extract_subnet` for
    full-kernel (k == max) architectures, so
    ``extract_subnet(inject_subnet(sp, ss, p, s, arch), arch) == (p, s)``.

    Warm-starts NAS from a trained subnet checkpoint: candidates that share
    the subnet's leading channels inherit its behavior, giving the
    AccuracyPredictor a differentiating signal without a full supernet
    training run.  (The reference has no inverse of its weight_transfer.py;
    this is new infrastructure.)  Kernel-cropped (k < max) blocks are not
    invertible through the learned 7->5/3 transforms and are rejected."""
    import jax.numpy as jnp

    sp = jax.tree_util.tree_map(jnp.asarray, super_params)
    ss = jax.tree_util.tree_map(jnp.asarray, super_state)

    def set_conv(dst, src, cin, cout):
        return {"w": dst["w"].at[:, :, :cin, :cout].set(src["w"])}

    def set_bn(dstp, dsts, srcp, srcs, c):
        return (
            {"scale": dstp["scale"].at[:c].set(srcp["scale"]),
             "bias": dstp["bias"].at[:c].set(srcp["bias"])},
            {"mean": dsts["mean"].at[:c].set(srcs["mean"]),
             "var": dsts["var"].at[:c].set(srcs["var"])},
        )

    ic = arch.input_channel
    sp["first"]["cbr0"] = params["first"]["cbr0"]
    sp["first"]["cbr1"] = params["first"]["cbr1"]
    ss["first"]["cbr0"] = state["first"]["cbr0"]
    ss["first"]["cbr1"] = state["first"]["cbr1"]
    sp["first"]["conv2"] = set_conv(sp["first"]["conv2"],
                                    params["first"]["conv2"], STEM_CHANNELS, ic)
    sp["first"]["bn2"], ss["first"]["bn2"] = set_bn(
        sp["first"]["bn2"], ss["first"]["bn2"],
        params["first"]["bn2"], state["first"]["bn2"], ic)

    cin = ic
    for si, st in enumerate(arch.backbone_setting):
        for bi in range(st.num_blocks):
            t, k = st.block_setting[bi]
            if k != dims.kernel:
                raise ValueError(
                    f"inject_subnet: stage {si} block {bi} kernel {k} != "
                    f"max {dims.kernel} — kernel-cropped blocks are not "
                    f"invertible")
            feat = round(cin * t)
            dst = sp["stage"][si][bi]
            dss = ss["stage"][si][bi]
            src = params["stage"][si][bi]
            srs = state["stage"][si][bi]
            dst["inv"]["conv"] = set_conv(dst["inv"]["conv"],
                                          src["inv"]["conv"], cin, feat)
            dst["depth"]["conv"] = {
                "w": dst["depth"]["conv"]["w"].at[:, :, :, :feat].set(
                    src["depth"]["conv"]["w"])
            }
            dst["point"]["conv"] = set_conv(dst["point"]["conv"],
                                            src["point"]["conv"], feat,
                                            st.channel)
            for name, width in (("inv", feat), ("depth", feat),
                                ("point", st.channel)):
                dst[name]["bn"], dss[name]["bn"] = set_bn(
                    dst[name]["bn"], dss[name]["bn"],
                    src[name]["bn"], srs[name]["bn"], width)
            cin = st.channel

    channels = list(arch.stage_channels)
    filters = arch.deconv_setting
    inplanes = channels[-1]
    for i in range(spec.num_deconv_layers):
        raw_c = channels[-i - 2]
        sp["deconv_refined"][i] = {
            "w": sp["deconv_refined"][i]["w"].at[
                :, :, :inplanes, : filters[i]].set(
                params["deconv_refined"][i]["w"])
        }
        sp["deconv_raw"][i] = {
            "w": sp["deconv_raw"][i]["w"].at[:, :, :raw_c, : filters[i]].set(
                params["deconv_raw"][i]["w"])
        }
        sp["deconv_bn"][i], ss["deconv_bn"][i] = set_bn(
            sp["deconv_bn"][i], ss["deconv_bn"][i],
            params["deconv_bn"][i], state["deconv_bn"][i], filters[i])
        inplanes = filters[i]

    for i, cout in enumerate(spec.final_channels(), start=1):
        for key, cin_f, src_p, src_s in (
            ("final_refined", filters[i], params["final_refined"][i - 1],
             state["final_refined"][i - 1]),
            ("final_raw", channels[-i - 3], params["final_raw"][i - 1],
             state["final_raw"][i - 1]),
        ):
            dst = sp[key][i - 1]
            dss = ss[key][i - 1]
            dst["dw"]["conv"] = {
                "w": dst["dw"]["conv"]["w"].at[:, :, :, :cin_f].set(
                    src_p["dw"]["conv"]["w"])
            }
            dst["pw"]["conv"] = {
                "w": dst["pw"]["conv"]["w"].at[:, :, :cin_f, :cout].set(
                    src_p["pw"]["conv"]["w"])
            }
            dst["dw"]["bn"], dss["dw"]["bn"] = set_bn(
                dst["dw"]["bn"], dss["dw"]["bn"],
                src_p["dw"]["bn"], src_s["dw"]["bn"], cin_f)
    return sp, ss


# --------------------------------------------------------------------------
# channel re-organization by importance
# --------------------------------------------------------------------------


def reorganize_weights(params, state):
    """Sort channels so the leading slice holds the most important ones
    (L1 importance of the next layer's input weights) — reference
    ``re_organize_weights`` (pose_supermobilenet.py:174-196).

    Improvement over the reference: the reference never re-permutes the
    head's raw/skip-branch consumers of the permuted stage outputs
    (deconv_raw / final_raw in-channels), silently changing the network
    function (harmless there only because it is applied right after a
    backbone-only pretrain load, when the head is random).  We permute the
    consumers too, making the transform function-preserving — verified in
    tests/test_supernet.py."""

    def bn_perm(pp, ss, idx):
        return (
            {"scale": pp["scale"][idx], "bias": pp["bias"][idx]},
            {"mean": ss["mean"][idx], "var": ss["var"][idx]},
        )

    params = jax.tree.map(lambda x: x, params)  # shallow copy via rebuild
    state = jax.tree.map(lambda x: x, state)
    n_stages = len(params["stage"])
    n_deconv = len(params["deconv_raw"])

    def permute_raw_consumers(stage_out_index, idx):
        """Permute in-channels of head branches reading x_list entry
        ``stage_out_index`` (0 = stem output, 1 + si = stage si output)."""
        # deconv_raw[i] reads x_list[-i-2] == entry (n_stages - 1 - i)
        for i in range(n_deconv):
            if n_stages - 1 - i == stage_out_index:
                w = params["deconv_raw"][i]["w"]
                params["deconv_raw"][i]["w"] = w[:, :, idx, :]
        # final_raw[i-1] reads x_list[-i-3] == entry (n_stages - 2 - i), i>=1
        for i in range(1, n_deconv):
            if n_stages - 2 - i == stage_out_index:
                fr = params["final_raw"][i - 1]
                fr["dw"]["conv"]["w"] = fr["dw"]["conv"]["w"][:, :, :, idx]
                fr["dw"]["bn"], state["final_raw"][i - 1]["dw"]["bn"] = bn_perm(
                    fr["dw"]["bn"], state["final_raw"][i - 1]["dw"]["bn"], idx
                )
                fr["pw"]["conv"]["w"] = fr["pw"]["conv"]["w"][:, :, idx, :]

    # stem output channels, ranked by stage0 block0 expand-conv input usage
    nxt = params["stage"][0][0]["inv"]["conv"]["w"]  # (1,1,I,O)
    imp = jnp.sum(jnp.abs(nxt), axis=(0, 1, 3))
    idx = jnp.argsort(-imp)
    params["first"]["conv2"]["w"] = params["first"]["conv2"]["w"][:, :, :, idx]
    params["first"]["bn2"], state["first"]["bn2"] = bn_perm(
        params["first"]["bn2"], state["first"]["bn2"], idx
    )
    params["stage"][0][0]["inv"]["conv"]["w"] = nxt[:, :, idx, :]
    permute_raw_consumers(0, idx)

    # per-stage output channels, ranked by the next stage's first expand conv
    for si in range(n_stages - 1):
        nxt = params["stage"][si + 1][0]["inv"]["conv"]["w"]
        imp = jnp.sum(jnp.abs(nxt), axis=(0, 1, 3))
        idx = jnp.argsort(-imp)
        params["stage"][si + 1][0]["inv"]["conv"]["w"] = nxt[:, :, idx, :]
        for bi in range(len(params["stage"][si])):
            blk = params["stage"][si][bi]
            blk["point"]["conv"]["w"] = blk["point"]["conv"]["w"][:, :, :, idx]
            blk["point"]["bn"], state["stage"][si][bi]["point"]["bn"] = bn_perm(
                blk["point"]["bn"], state["stage"][si][bi]["point"]["bn"], idx
            )
            if bi > 0:
                blk["inv"]["conv"]["w"] = blk["inv"]["conv"]["w"][:, :, idx, :]
        permute_raw_consumers(1 + si, idx)
    return params, state


# jit + persistent-cache the init graph (see layers.jit_init)
init_super_litepose = L.jit_init(init_super_litepose, ("spec", "dims"))

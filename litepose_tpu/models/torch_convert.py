"""PyTorch -> JAX checkpoint conversion for LitePose models.

Understands the reference ``state_dict`` layouts
(``/root/reference/lib/models/pose_mobilenet.py``), including the
``module.`` DDP prefix and the ``1.`` prefix left by the reference fp16
wrapper (stripped the same way as ``/root/reference/weight_transfer.py:199-201``
and ``/root/reference/lib/models/pose_supermobilenet.py:212-213``).

Weight layout conversions:
  * Conv2d      (O, I, kh, kw)  -> HWIO (kh, kw, I, O)
  * depthwise   (C, 1, kh, kw)  -> (kh, kw, 1, C)
  * ConvTranspose2d (I, O, kh, kw) -> spatially flipped (kh, kw, I, O)
    (pre-flipped so our lhs-dilated-conv deconv matches torch exactly)
  * BatchNorm   weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from ..arch.schema import ArchConfig
from .litepose import ModelSpec


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_w(t) -> np.ndarray:
    return _np(t).transpose(2, 3, 1, 0)


def deconv_w(t) -> np.ndarray:
    w = _np(t).transpose(2, 3, 0, 1)  # (kh, kw, I, O)
    return w[::-1, ::-1].copy()


def strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip ``module.`` (DDP) and leading ``1.`` (fp16 Sequential wrapper)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if re.match(r"^1\.", k):
            k = k[2:]
        out[k] = v
    return out


def _bn(sd: Mapping[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])},
    )


def litepose_from_torch(
    sd: Mapping[str, Any],
    spec: ModelSpec,
    arch: ArchConfig,
    with_skips: bool = True,
):
    """Build (params, state) pytrees from a reference LitePose state_dict."""
    sd = strip_prefixes(sd)
    params: dict = {}
    state: dict = {}

    # stem: first.0 = convbnrelu, first.1 = dw convbnrelu, first.2 conv, first.3 bn
    def cbr(prefix):
        p_bn, s_bn = _bn(sd, f"{prefix}.1")
        return (
            {"conv": {"w": conv_w(sd[f"{prefix}.0.weight"])}, "bn": p_bn},
            {"bn": s_bn},
        )

    p0, s0 = cbr("first.0")
    p1, s1 = cbr("first.1")
    pb2, sb2 = _bn(sd, "first.3")
    params["first"] = {
        "cbr0": p0,
        "cbr1": p1,
        "conv2": {"w": conv_w(sd["first.2.weight"])},
        "bn2": pb2,
    }
    state["first"] = {"cbr0": s0, "cbr1": s1, "bn2": sb2}

    # backbone
    stages_p, stages_s = [], []
    for si, st in enumerate(arch.backbone_setting):
        blocks_p, blocks_s = [], []
        for bi in range(st.num_blocks):
            pre = f"stage.{si}.{bi}"
            bp, bs = {}, {}
            for ours, theirs in (("inv", "inv"), ("depth", "depth_conv"), ("point", "point_conv")):
                p_bn, s_bn = _bn(sd, f"{pre}.{theirs}.1")
                bp[ours] = {"conv": {"w": conv_w(sd[f"{pre}.{theirs}.0.weight"])}, "bn": p_bn}
                bs[ours] = {"bn": s_bn}
            blocks_p.append(bp)
            blocks_s.append(bs)
        stages_p.append(blocks_p)
        stages_s.append(blocks_s)
    params["stage"] = stages_p
    state["stage"] = stages_s

    # deconv head
    n_deconv = spec.num_deconv_layers
    params["deconv_refined"] = [
        {"w": deconv_w(sd[f"deconv_refined.{i}.weight"])} for i in range(n_deconv)
    ]
    if with_skips:
        params["deconv_raw"] = [
            {"w": deconv_w(sd[f"deconv_raw.{i}.weight"])} for i in range(n_deconv)
        ]
    dbn = [_bn(sd, f"deconv_bnrelu.{i}.0") for i in range(n_deconv)]
    params["deconv_bn"] = [p for p, _ in dbn]
    state["deconv_bn"] = [s for _, s in dbn]

    # final heads: final_*.{i}.conv.{0:dw, 1:bn, 3:pw}
    def sep(prefix):
        p_bn, s_bn = _bn(sd, f"{prefix}.conv.1")
        return (
            {
                "dw": {"conv": {"w": conv_w(sd[f"{prefix}.conv.0.weight"])}, "bn": p_bn},
                "pw": {"conv": {"w": conv_w(sd[f"{prefix}.conv.3.weight"])}},
            },
            {"dw": {"bn": s_bn}},
        )

    n_final = n_deconv - 1
    fr = [sep(f"final_refined.{i}") for i in range(n_final)]
    params["final_refined"] = [p for p, _ in fr]
    state["final_refined"] = [s for _, s in fr]
    if with_skips:
        fw = [sep(f"final_raw.{i}") for i in range(n_final)]
        params["final_raw"] = [p for p, _ in fw]
        state["final_raw"] = [s for _, s in fw]

    return params, state


def _inv_conv_w(w) -> np.ndarray:
    """HWIO -> torch OIHW (inverse of :func:`conv_w`)."""
    return np.asarray(w, np.float32).transpose(3, 2, 0, 1)


def _inv_deconv_w(w) -> np.ndarray:
    """Flipped HWOI -> torch IOHW (inverse of :func:`deconv_w`)."""
    w = np.asarray(w, np.float32)[::-1, ::-1]
    return w.transpose(2, 3, 0, 1).copy()


def litepose_to_torch(
    params, state, spec: ModelSpec, arch: ArchConfig, with_skips: bool = True
) -> Dict[str, np.ndarray]:
    """(params, state) pytrees -> reference-layout LitePose state_dict
    (numpy fp32 values; exact inverse of :func:`litepose_from_torch`).

    Lets checkpoints trained in this framework run in the reference
    (``/root/reference/lib/models/pose_mobilenet.py``) — e.g. for oracle
    parity at protocol resolution with trained weights — and round-trips
    bit-exactly with ``litepose_from_torch`` (tests/test_litepose_torch_parity).
    BN ``num_batches_tracked`` entries are emitted as zeros (torch tracks
    them but eval-mode BN never reads them)."""
    sd: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p_bn, s_bn):
        sd[f"{prefix}.weight"] = np.asarray(p_bn["scale"], np.float32)
        sd[f"{prefix}.bias"] = np.asarray(p_bn["bias"], np.float32)
        sd[f"{prefix}.running_mean"] = np.asarray(s_bn["mean"], np.float32)
        sd[f"{prefix}.running_var"] = np.asarray(s_bn["var"], np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)

    def put_cbr(prefix, p, s):
        sd[f"{prefix}.0.weight"] = _inv_conv_w(p["conv"]["w"])
        put_bn(f"{prefix}.1", p["bn"], s["bn"])

    put_cbr("first.0", params["first"]["cbr0"], state["first"]["cbr0"])
    put_cbr("first.1", params["first"]["cbr1"], state["first"]["cbr1"])
    sd["first.2.weight"] = _inv_conv_w(params["first"]["conv2"]["w"])
    put_bn("first.3", params["first"]["bn2"], state["first"]["bn2"])

    for si, st in enumerate(arch.backbone_setting):
        for bi in range(st.num_blocks):
            pre = f"stage.{si}.{bi}"
            bp = params["stage"][si][bi]
            bs = state["stage"][si][bi]
            for ours, theirs in (("inv", "inv"), ("depth", "depth_conv"),
                                 ("point", "point_conv")):
                sd[f"{pre}.{theirs}.0.weight"] = _inv_conv_w(bp[ours]["conv"]["w"])
                put_bn(f"{pre}.{theirs}.1", bp[ours]["bn"], bs[ours]["bn"])

    n_deconv = spec.num_deconv_layers
    for i in range(n_deconv):
        sd[f"deconv_refined.{i}.weight"] = _inv_deconv_w(
            params["deconv_refined"][i]["w"])
        if with_skips:
            sd[f"deconv_raw.{i}.weight"] = _inv_deconv_w(
                params["deconv_raw"][i]["w"])
        put_bn(f"deconv_bnrelu.{i}.0", params["deconv_bn"][i],
               state["deconv_bn"][i])

    def put_sep(prefix, p, s):
        sd[f"{prefix}.conv.0.weight"] = _inv_conv_w(p["dw"]["conv"]["w"])
        put_bn(f"{prefix}.conv.1", p["dw"]["bn"], s["dw"]["bn"])
        sd[f"{prefix}.conv.3.weight"] = _inv_conv_w(p["pw"]["conv"]["w"])

    for i in range(n_deconv - 1):
        put_sep(f"final_refined.{i}", params["final_refined"][i],
                state["final_refined"][i])
        if with_skips:
            put_sep(f"final_raw.{i}", params["final_raw"][i],
                    state["final_raw"][i])

    return sd


def hrnet_from_torch(sd: Mapping[str, Any], spec) -> Tuple[dict, dict]:
    """Build (params, state) for ``higher_hrnet`` from a reference
    PoseHigherResolutionNet state_dict
    (``/root/reference/lib/models/pose_higher_hrnet.py``)."""
    sd = strip_prefixes(sd)
    params: dict = {}
    state: dict = {}

    def cb(conv_key, bn_key):
        p_bn, s_bn = _bn(sd, bn_key)
        return {"conv": {"w": conv_w(sd[conv_key + ".weight"])}, "bn": p_bn}, {"bn": s_bn}

    p1, s1 = cb("conv1", "bn1")
    p2, s2 = cb("conv2", "bn2")
    params["stem"] = {"c1": p1, "c2": p2}
    state["stem"] = {"c1": s1, "c2": s2}

    def res_block(prefix, kind):
        convs = ("conv1", "conv2") if kind == "basic" else ("conv1", "conv2", "conv3")
        bp, bs = {}, {}
        for idx, cname in enumerate(convs, start=1):
            pp, ss = cb(f"{prefix}.{cname}", f"{prefix}.bn{idx}")
            bp[f"c{idx}"] = pp
            bs[f"c{idx}"] = ss
        if f"{prefix}.downsample.0.weight" in sd:
            pp, ss = cb(f"{prefix}.downsample.0", f"{prefix}.downsample.1")
            bp["down"] = pp
            bs["down"] = ss
        return bp, bs

    l1p, l1s = [], []
    for k in range(4):
        bp, bs = res_block(f"layer1.{k}", "bottleneck")
        l1p.append(bp)
        l1s.append(bs)
    params["layer1"] = l1p
    state["layer1"] = l1s

    stage_specs = {"2": spec.stage2, "3": spec.stage3, "4": spec.stage4}
    n_pre = 1
    for name, st in stage_specs.items():
        # our transition{N} feeds stage N; the reference names it
        # transition{N-1} (pose_higher_hrnet.py:273-300)
        ref_t = int(name) - 1
        t_p, t_s = [], []
        for i in range(st.num_branches):
            base = f"transition{ref_t}.{i}"
            if f"{base}.0.weight" in sd and f"{base}.0.0.weight" not in sd:
                pp, ss = cb(f"{base}.0", f"{base}.1")
                t_p.append({"cbr": pp})
                t_s.append({"cbr": ss})
            elif f"{base}.0.0.weight" in sd:
                chain_p, chain_s = [], []
                j = 0
                while f"{base}.{j}.0.weight" in sd:
                    pp, ss = cb(f"{base}.{j}.0", f"{base}.{j}.1")
                    chain_p.append(pp)
                    chain_s.append(ss)
                    j += 1
                t_p.append({"down": chain_p})
                t_s.append({"down": chain_s})
            else:
                t_p.append(None)
                t_s.append(None)
        params[f"transition{name}"] = t_p
        state[f"transition{name}"] = t_s

        mods_p, mods_s = [], []
        for m in range(st.num_modules):
            mp: dict = {"branches": [], "fuse": []}
            ms: dict = {"branches": [], "fuse": []}
            for b in range(st.num_branches):
                base = f"stage{name}.{m}.branches.{b}"
                if f"{base}.0.weight" in sd:  # 0-block convbnrelu branch
                    pp, ss = cb(f"{base}.0", f"{base}.1")
                    mp["branches"].append({"cbr": pp})
                    ms["branches"].append({"cbr": ss})
                else:
                    blocks_p, blocks_s = [], []
                    kind = "bottleneck" if st.block == "BOTTLENECK" else "basic"
                    for k in range(st.num_blocks[b]):
                        bp, bs = res_block(f"{base}.{k}", kind)
                        blocks_p.append(bp)
                        blocks_s.append(bs)
                    mp["branches"].append({"blocks": blocks_p})
                    ms["branches"].append({"blocks": blocks_s})
            fuse_prefix = f"stage{name}.{m}.fuse_layers."
            n_rows = 1 + max(
                (int(k[len(fuse_prefix):].split(".")[0]) for k in sd if k.startswith(fuse_prefix)),
                default=-1,
            )
            for i in range(n_rows):
                row_p, row_s = [], []
                for j in range(st.num_branches):
                    base = f"stage{name}.{m}.fuse_layers.{i}.{j}"
                    if j == i:
                        row_p.append(None)
                        row_s.append(None)
                    elif j > i:
                        pp, ss = cb(f"{base}.0", f"{base}.1")
                        row_p.append({"up": pp})
                        row_s.append({"up": ss})
                    else:
                        chain_p, chain_s = [], []
                        for k in range(i - j):
                            pp, ss = cb(f"{base}.{k}.0", f"{base}.{k}.1")
                            chain_p.append(pp)
                            chain_s.append(ss)
                        row_p.append({"down": chain_p})
                        row_s.append({"down": chain_s})
                mp["fuse"].append(row_p)
                ms["fuse"].append(row_s)
            mods_p.append(mp)
            mods_s.append(ms)
        params[f"stage{name}"] = mods_p
        state[f"stage{name}"] = mods_s

    finals = []
    i = 0
    while f"final_layers.{i}.weight" in sd:
        finals.append(
            {"w": conv_w(sd[f"final_layers.{i}.weight"]), "b": _np(sd[f"final_layers.{i}.bias"])}
        )
        i += 1
    params["final"] = finals

    dec_p, dec_s = [], []
    i = 0
    while f"deconv_layers.{i}.0.0.weight" in sd:
        p_bn, s_bn = _bn(sd, f"deconv_layers.{i}.0.1")
        dp = {"deconv": {"w": deconv_w(sd[f"deconv_layers.{i}.0.0.weight"])}, "bn": p_bn}
        ds = {"bn": s_bn}
        blocks_p, blocks_s = [], []
        k = 1
        while f"deconv_layers.{i}.{k}.0.conv1.weight" in sd:
            bp, bs = res_block(f"deconv_layers.{i}.{k}.0", "basic")
            blocks_p.append(bp)
            blocks_s.append(bs)
            k += 1
        dp["blocks"] = blocks_p
        ds["blocks"] = blocks_s
        dec_p.append(dp)
        dec_s.append(ds)
        i += 1
    params["deconv"] = dec_p
    state["deconv"] = dec_s
    return params, state


def efficient_hrnet_from_torch(sd: Mapping[str, Any], spec) -> Tuple[dict, dict]:
    """Build (params, state) for ``efficient_hrnet`` from a reference
    pose_efficient_hrnet state_dict."""
    sd = strip_prefixes(sd)
    params: dict = {}
    state: dict = {}

    def cb(conv_key, bn_key, with_bias=False):
        p_bn, s_bn = _bn(sd, bn_key)
        conv = {"w": conv_w(sd[conv_key + ".weight"])}
        if with_bias:
            conv["b"] = _np(sd[conv_key + ".bias"])
        return {"conv": conv, "bn": p_bn}, {"bn": s_bn}

    plan = spec.backbone_plan()
    feats_p, feats_s = [], []
    for i, (cin, cout, expand, kernel, stride) in enumerate(plan):
        if expand == 0:  # stem: Sequential(ZeroPad, Conv, BN, Swish)
            fp, fs = cb(f"features.{i}.1", f"features.{i}.2")
            feats_p.append(fp)
            feats_s.append(fs)
            continue
        hidden = cin * expand
        off = 0
        fp: dict = {}
        fs: dict = {}
        if hidden != cin:
            pp, ss = cb(f"features.{i}.conv.0.1", f"features.{i}.conv.0.2")
            fp["expand"] = pp
            fs["expand"] = ss
            off = 1
        pp, ss = cb(f"features.{i}.conv.{off}.1", f"features.{i}.conv.{off}.2")
        fp["dw"] = pp
        fs["dw"] = ss
        se_base = f"features.{i}.conv.{off + 1}.se"
        fp["se"] = {
            "r": {"w": conv_w(sd[f"{se_base}.1.weight"]), "b": _np(sd[f"{se_base}.1.bias"])},
            "e": {"w": conv_w(sd[f"{se_base}.3.weight"]), "b": _np(sd[f"{se_base}.3.bias"])},
        }
        p_bn, s_bn = _bn(sd, f"features.{i}.conv.{off + 3}")
        fp["project"] = {"conv": {"w": conv_w(sd[f"features.{i}.conv.{off + 2}.weight"])}, "bn": p_bn}
        fs["project"] = {"bn": s_bn}
        feats_p.append(fp)
        feats_s.append(fs)
    params["features"] = feats_p
    state["features"] = feats_s

    for tname, n_branches in (("trans1", 2), ("trans2", 3), ("trans3", 4)):
        b_p, b_s = [], []
        for m in range(1, n_branches + 1):
            pp, ss = cb(f"{tname}_branch{m}.0", f"{tname}_branch{m}.1", with_bias=True)
            b_p.append(pp)
            b_s.append(ss)
        params[tname] = b_p
        state[tname] = b_s

    def res_block(prefix):
        bp, bs = {}, {}
        for idx in (1, 2):
            pp, ss = cb(f"{prefix}.conv{idx}", f"{prefix}.bn{idx}")
            bp[f"c{idx}"] = pp
            bs[f"c{idx}"] = ss
        if f"{prefix}.downsample.0.weight" in sd:
            pp, ss = cb(f"{prefix}.downsample.0", f"{prefix}.downsample.1")
            bp["down"] = pp
            bs["down"] = ss
        return bp, bs

    for name, st in (("2", spec.stage2), ("3", spec.stage3), ("4", spec.stage4)):
        mods_p, mods_s = [], []
        for m in range(st.num_modules):
            mp: dict = {"branches": [], "fuse": []}
            ms: dict = {"branches": [], "fuse": []}
            for b in range(st.num_branches):
                blocks_p, blocks_s = [], []
                for k in range(st.num_blocks[b]):
                    bp, bs = res_block(f"stage{name}.{m}.branches.{b}.{k}")
                    blocks_p.append(bp)
                    blocks_s.append(bs)
                mp["branches"].append({"blocks": blocks_p})
                ms["branches"].append({"blocks": blocks_s})
            fuse_prefix = f"stage{name}.{m}.fuse_layers."
            n_rows = 1 + max(
                (int(k[len(fuse_prefix):].split(".")[0]) for k in sd if k.startswith(fuse_prefix)),
                default=-1,
            )
            for i in range(n_rows):
                row_p, row_s = [], []
                for j in range(st.num_branches):
                    base = f"stage{name}.{m}.fuse_layers.{i}.{j}"
                    if j == i:
                        row_p.append(None)
                        row_s.append(None)
                    elif j > i:
                        pp, ss = cb(f"{base}.0", f"{base}.1")
                        row_p.append({"up": pp})
                        row_s.append({"up": ss})
                    else:
                        chain_p, chain_s = [], []
                        for k in range(i - j):
                            pp, ss = cb(f"{base}.{k}.0", f"{base}.{k}.1")
                            chain_p.append(pp)
                            chain_s.append(ss)
                        row_p.append({"down": chain_p})
                        row_s.append({"down": chain_s})
                mp["fuse"].append(row_p)
                ms["fuse"].append(row_s)
            mods_p.append(mp)
            mods_s.append(ms)
        params[f"stage{name}"] = mods_p
        state[f"stage{name}"] = mods_s

    finals = []
    i = 0
    while f"final_layers.{i}.weight" in sd:
        finals.append(
            {"w": conv_w(sd[f"final_layers.{i}.weight"]), "b": _np(sd[f"final_layers.{i}.bias"])}
        )
        i += 1
    params["final"] = finals

    dec_p, dec_s = [], []
    i = 0
    while f"deconv_layers.{i}.0.0.weight" in sd:
        p_bn, s_bn = _bn(sd, f"deconv_layers.{i}.0.1")
        dp = {"deconv": {"w": deconv_w(sd[f"deconv_layers.{i}.0.0.weight"])}, "bn": p_bn}
        ds = {"bn": s_bn}
        blocks_p, blocks_s = [], []
        k = 1
        while f"deconv_layers.{i}.{k}.0.conv1.weight" in sd:
            bp, bs = res_block(f"deconv_layers.{i}.{k}.0")
            blocks_p.append(bp)
            blocks_s.append(bs)
            k += 1
        dp["blocks"] = blocks_p
        ds["blocks"] = blocks_s
        dec_p.append(dp)
        dec_s.append(ds)
        i += 1
    params["deconv"] = dec_p
    state["deconv"] = dec_s
    return params, state


def load_torch_checkpoint(path: str, allow_pickle: bool = False):
    """Load a .pth[.tar] checkpoint file to a flat state_dict (CPU).

    Checkpoints are untrusted content: try ``weights_only=True`` first
    (no arbitrary pickle execution) and only fall back to the unsafe
    loader when the caller explicitly opts in via ``allow_pickle``."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise RuntimeError(
                f"safe (weights_only) load of {path!r} failed: {e}. "
                "If you trust this checkpoint, retry with allow_pickle=True "
                "(executes arbitrary pickle code)."
            ) from e
        import warnings

        warnings.warn(
            f"falling back to unsafe pickle load for {path!r}", stacklevel=2
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "best_state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                return ckpt[key]
    return ckpt

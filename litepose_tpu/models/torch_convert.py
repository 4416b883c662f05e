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


def load_torch_checkpoint(path: str):
    """Load a .pth[.tar] checkpoint file to a flat state_dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "best_state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                return ckpt[key]
    return ckpt

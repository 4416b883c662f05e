"""BatchNorm folding for inference (the ``fuse_bn.py`` capability).

Folds every conv->BN pair of a LitePose params/state pytree: the conv
weight absorbs the BN scale (``w' = w * gamma / sqrt(var + eps)`` per output
channel) and the BN node is left as a pure bias add (scale=1, mean=0,
var=1-eps, bias = beta - gamma*mean/sqrt(var+eps)).  Outputs are bit-equal
to the unfolded network in eval mode.

Design note vs the reference (``/root/reference/fuse_bn.py:81-137``): the
reference pushes the bias into the convs themselves, which forces the
``op=0`` trick — zeroing the bias on the second ("raw") deconv branch so the
shared BN bias isn't added twice when the branches are summed (:159).  Here
the fold keeps the single bias at the BN site after the sum, so the
double-add hazard doesn't exist, and the same transform handles every
conv/deconv/sepconv uniformly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import BN_EPS


def _fold_pair(conv_p, bn_p, bn_s):
    """Returns (folded conv params, identity-BN params, identity-BN state)."""
    a = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + BN_EPS)
    bias = bn_p["bias"] - a * bn_s["mean"]
    new_conv = {"w": conv_p["w"] * a[None, None, None, :]}
    ident_p = {"scale": jnp.ones_like(a), "bias": bias}
    ident_s = {"mean": jnp.zeros_like(a), "var": jnp.full_like(a, 1.0 - BN_EPS)}
    return new_conv, ident_p, ident_s


def fold_litepose_bn(params, state, with_skips: bool = True):
    """Fold all BNs of a fixed LitePose network. Returns (params, state)
    numerically identical in eval mode, with BN reduced to a bias add."""
    params = jax.tree.map(lambda x: x, params)
    state = jax.tree.map(lambda x: x, state)

    def fold_at(p_holder, conv_key, bn_holder_p, bn_holder_s, bn_key):
        c, ip, isb = _fold_pair(p_holder[conv_key], bn_holder_p[bn_key], bn_holder_s[bn_key])
        p_holder[conv_key] = c
        bn_holder_p[bn_key] = ip
        bn_holder_s[bn_key] = isb

    # stem
    for cbr in ("cbr0", "cbr1"):
        fold_at(params["first"][cbr], "conv", params["first"][cbr], state["first"][cbr], "bn")
    fold_at(params["first"], "conv2", params["first"], state["first"], "bn2")

    # backbone
    for si in range(len(params["stage"])):
        for bi in range(len(params["stage"][si])):
            blk_p = params["stage"][si][bi]
            blk_s = state["stage"][si][bi]
            for part in ("inv", "depth", "point"):
                fold_at(blk_p[part], "conv", blk_p[part], blk_s[part], "bn")

    # deconv head: BN follows the SUM of refined+raw — scale both branch
    # weights; the bias stays at the (single) BN site.
    for i in range(len(params["deconv_bn"])):
        a = params["deconv_bn"][i]["scale"] * jax.lax.rsqrt(
            state["deconv_bn"][i]["var"] + BN_EPS
        )
        bias = params["deconv_bn"][i]["bias"] - a * state["deconv_bn"][i]["mean"]
        params["deconv_refined"][i] = {"w": params["deconv_refined"][i]["w"] * a}
        if with_skips and "deconv_raw" in params:
            params["deconv_raw"][i] = {"w": params["deconv_raw"][i]["w"] * a}
        params["deconv_bn"][i] = {"scale": jnp.ones_like(a), "bias": bias}
        state["deconv_bn"][i] = {
            "mean": jnp.zeros_like(a),
            "var": jnp.full_like(a, 1.0 - BN_EPS),
        }

    # final heads (SepConv2d: dw conv -> BN -> relu -> pw conv)
    for key in ("final_refined", "final_raw"):
        if key not in params:
            continue
        for i in range(len(params[key])):
            sep_p = params[key][i]
            sep_s = state[key][i]
            fold_at(sep_p["dw"], "conv", sep_p["dw"], sep_s["dw"], "bn")
    return params, state

"""Functional NHWC layer library (conv / deconv / BN / blocks).

TPU-first re-design of the reference block library
(``/root/reference/lib/models/layers/layers.py``): pure functions over
explicit parameter/state pytrees, NHWC layout, bf16 compute with fp32
parameters and fp32 accumulation.  Numerical semantics (padding, strides,
BN epsilon/momentum, ReLU6) match PyTorch so reference checkpoints convert
bit-for-bit (see tests/test_litepose_torch_parity.py).

Conventions:
  * conv weights are HWIO; depthwise convs use ``feature_group_count`` with
    kernel shape (kh, kw, 1, C).
  * transposed convs keep the *torch* OIHW-transposed layout notion resolved
    to an HWIO kernel for a lhs-dilated conv (exact ConvTranspose2d match).
  * params pytree holds trainables; state pytree (same nesting) holds BN
    running statistics.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]
State = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


class Policy(NamedTuple):
    """Mixed-precision policy: conv/matmul inputs are cast to
    ``compute_dtype``; accumulation and BN statistics stay fp32."""

    compute_dtype: Any = jnp.bfloat16
    precision: Any = None  # lax.Precision; None => backend default

    @staticmethod
    def exact() -> "Policy":
        """Full-fp32, highest-precision policy for parity tests."""
        return Policy(compute_dtype=jnp.float32, precision=lax.Precision.HIGHEST)


DEFAULT_POLICY = Policy()


# --------------------------------------------------------------------------
# primitive initializers
# --------------------------------------------------------------------------


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    # Kaiming-uniform with a=sqrt(5) — torch's default Conv2d init — keeps
    # from-scratch training dynamics comparable to the reference.
    bound = 1.0 / np.sqrt(fan_in) * np.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_init(key, k: int, cin: int, cout: int, groups: int = 1) -> Params:
    """HWIO conv kernel. fan_in = k*k*cin/groups (torch convention)."""
    shape = (k, k, cin // groups, cout)
    return {"w": _fan_in_uniform(key, shape, k * k * cin // groups)}


def deconv_init(key, k: int, cin: int, cout: int) -> Params:
    """Transposed-conv kernel stored HWIO as (k, k, cin, cout), pre-flipped
    for the lhs-dilated-conv formulation. fan_in follows torch
    ConvTranspose2d (k*k*cout)."""
    shape = (k, k, cin, cout)
    return {"w": _fan_in_uniform(key, shape, k * k * cout)}


def bn_init(c: int) -> Tuple[Params, State]:
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


# --------------------------------------------------------------------------
# primitive appliers
# --------------------------------------------------------------------------


def conv(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    groups: int = 1,
    policy: Policy = DEFAULT_POLICY,
    padding: Optional[int] = None,
    isolate: bool = False,
) -> jnp.ndarray:
    """NHWC conv with torch 'same-ish' padding k//2 (default).

    isolate: wrap the input in ``lax.optimization_barrier`` so this conv
    cannot pull upstream ops into its operand fusion.  With real (non-init)
    BN/bias constants, XLA TPU sometimes fuses a whole upstream convolution
    into a depthwise conv's operand fusion and recomputes it per output
    tile — measured 6.4x on a stage-0 LitePose block (12.1 -> 2.3 ms/b64,
    see PERF_NOTES.md round-3 "identity-BN artifact").  The barrier is a
    semantic no-op.
    """
    w = p["w"]
    k = w.shape[0]
    pad = k // 2 if padding is None else padding
    if isolate:
        x = lax.optimization_barrier(x)
    y = lax.conv_general_dilated(
        x.astype(policy.compute_dtype),
        w.astype(policy.compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision,
    )
    return y


def deconv(
    p: Params,
    x: jnp.ndarray,
    stride: int = 2,
    torch_padding: int = 1,
    output_padding: int = 0,
    policy: Policy = DEFAULT_POLICY,
) -> jnp.ndarray:
    """Exact torch ``ConvTranspose2d(k, stride, padding, output_padding)``.

    Implemented as an lhs-dilated conv with a spatially flipped kernel:
    output[n] = sum_i x[i] scattered by w — matches torch bit-for-bit at
    fp32/HIGHEST (verified vs torch in tests).  The reference deconv head
    uses (k=4, s=2, p=1) for an exact 2x upsample
    (``/root/reference/lib/models/pose_mobilenet.py:73-84``).
    """
    w = p["w"]  # (k, k, cin, cout), torch weight transposed+flipped at load
    k = w.shape[0]
    lo = k - 1 - torch_padding
    hi = k - 1 - torch_padding + output_padding
    y = lax.conv_general_dilated(
        x.astype(policy.compute_dtype),
        w.astype(policy.compute_dtype),
        window_strides=(1, 1),
        padding=[(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision,
    )
    return y


def batch_norm(
    p: Params,
    s: State,
    x: jnp.ndarray,
    train: bool,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
) -> Tuple[jnp.ndarray, State]:
    """BatchNorm over (N, H, W).  Under SPMD jit with the batch sharded on
    the data mesh axis, ``jnp.mean`` is a global mean — i.e. SyncBN
    (the reference needs ``nn.SyncBatchNorm``, ``/root/reference/dist_train.py:259``)
    comes for free."""
    if not train:
        # inference: a per-channel affine; fold the constants in fp32 and
        # apply in the activation dtype (bf16) — avoids materializing fp32
        # activations between convs (~15% forward win at bf16)
        inv = lax.rsqrt(s["var"] + eps) * p["scale"]
        bias = p["bias"] - s["mean"] * inv
        y = x * inv.astype(x.dtype) + bias.astype(x.dtype)
        return y, s

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.var(x32, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_state = {
        "mean": (1 - momentum) * s["mean"] + momentum * mean,
        "var": (1 - momentum) * s["var"] + momentum * unbiased,
    }
    inv = lax.rsqrt(var + eps) * p["scale"]
    y = (x32 - mean) * inv + p["bias"]
    return y.astype(x.dtype) if x.dtype != jnp.float32 else y, new_state


def conv_bn(pc, pb, sb, x, stride=1, groups=1, train=False,
            policy=DEFAULT_POLICY, padding=None, isolate=False):
    """conv followed by batch_norm.

    At eval the BN scale folds into the conv weights (w' = w * inv, computed
    in fp32 on the tiny weight tensor) so the epilogue is a single bias add —
    the separate per-channel multiply otherwise costs an extra VPU pass per
    conv (~8% of the LitePose forward, measured on v5e)."""
    if not train:
        inv = lax.rsqrt(sb["var"] + BN_EPS) * pb["scale"]
        bias = pb["bias"] - sb["mean"] * inv
        y = conv({"w": pc["w"] * inv}, x, stride=stride, groups=groups,
                 policy=policy, padding=padding, isolate=isolate)
        return y + bias.astype(y.dtype), sb
    y = conv(pc, x, stride=stride, groups=groups, policy=policy,
             padding=padding, isolate=isolate)
    return batch_norm(pb, sb, y, True)


def relu(x):
    return jnp.maximum(x, 0.0)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


# --------------------------------------------------------------------------
# composite blocks (init returns (params, state); apply returns (y, state))
# --------------------------------------------------------------------------


def convbnrelu_init(key, cin, cout, k=3, groups=1):
    """conv + BN + ReLU6 (reference ``convbnrelu``,
    ``/root/reference/lib/models/layers/layers.py:18-24``)."""
    pc = conv_init(key, k, cin, cout, groups)
    pb, sb = bn_init(cout)
    return {"conv": pc, "bn": pb}, {"bn": sb}


def convbnrelu_apply(p, s, x, stride=1, groups=1, train=False, policy=DEFAULT_POLICY,
                     isolate=False):
    y, sb = conv_bn(p["conv"], p["bn"], s["bn"], x, stride=stride, groups=groups,
                    train=train, policy=policy, isolate=isolate)
    return relu6(y), {"bn": sb}


def inv_bottleneck_init(key, cin, cout, ker=3, exp=6):
    """MobileNetV2 inverted residual (reference ``InvBottleneck``,
    ``/root/reference/lib/models/layers/layers.py:90-118``)."""
    from ..arch.schema import make_divisible

    feat = make_divisible(round(cin * exp), 8)
    k1, k2, k3 = jax.random.split(key, 3)
    p_inv = conv_init(k1, 1, cin, feat)
    pb1, sb1 = bn_init(feat)
    p_dw = conv_init(k2, ker, feat, feat, groups=feat)
    pb2, sb2 = bn_init(feat)
    p_pt = conv_init(k3, 1, feat, cout)
    pb3, sb3 = bn_init(cout)
    params = {
        "inv": {"conv": p_inv, "bn": pb1},
        "depth": {"conv": p_dw, "bn": pb2},
        "point": {"conv": p_pt, "bn": pb3},
    }
    state = {"inv": {"bn": sb1}, "depth": {"bn": sb2}, "point": {"bn": sb3}}
    return params, state


def inv_bottleneck_apply(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY):
    cin = x.shape[-1]
    feat = p["depth"]["conv"]["w"].shape[-1]
    cout = p["point"]["conv"]["w"].shape[-1]

    y, s1 = conv_bn(p["inv"]["conv"], p["inv"]["bn"], s["inv"]["bn"], x,
                    train=train, policy=policy)
    y = relu6(y)
    y, s2 = conv_bn(p["depth"]["conv"], p["depth"]["bn"], s["depth"]["bn"], y,
                    stride=stride, groups=feat, train=train, policy=policy,
                    isolate=not train)
    y = relu6(y)
    y, s3 = conv_bn(p["point"]["conv"], p["point"]["bn"], s["point"]["bn"], y,
                    train=train, policy=policy)
    if stride == 1 and cin == cout:
        y = y + x
    new_state = {"inv": {"bn": s1}, "depth": {"bn": s2}, "point": {"bn": s3}}
    return y, new_state


def sepconv_init(key, cin, cout, ker=3):
    """Depthwise-separable head conv (reference ``SepConv2d``,
    ``/root/reference/lib/models/layers/layers.py:120-133``): dw-k + BN +
    ReLU + 1x1 (no BN after the pointwise)."""
    k1, k2 = jax.random.split(key)
    p_dw = conv_init(k1, ker, cin, cin, groups=cin)
    pb, sb = bn_init(cin)
    p_pt = conv_init(k2, 1, cin, cout)
    return {"dw": {"conv": p_dw, "bn": pb}, "pw": {"conv": p_pt}}, {"dw": {"bn": sb}}


def sepconv_apply(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY):
    cin = x.shape[-1]
    y, sb = conv_bn(p["dw"]["conv"], p["dw"]["bn"], s["dw"]["bn"], x,
                    stride=stride, groups=cin, train=train, policy=policy,
                    isolate=not train)
    y = relu(y)
    y = conv(p["pw"]["conv"], y, policy=policy)
    return y, {"dw": {"bn": sb}}


def bottleneck_init(key, cin, cout, k=3, r=4):
    """Classic ResNet bottleneck (reference ``Bottleneck``,
    ``/root/reference/lib/models/layers/layers.py:26-56``)."""
    mid = cout // r
    k1, k2, k3 = jax.random.split(key, 3)
    p1 = conv_init(k1, 1, cin, mid)
    b1, s1 = bn_init(mid)
    p2 = conv_init(k2, k, mid, mid)
    b2, s2 = bn_init(mid)
    p3 = conv_init(k3, 1, mid, cout)
    b3, s3 = bn_init(cout)
    return (
        {"conv1": p1, "bn1": b1, "conv2": p2, "bn2": b2, "conv3": p3, "bn3": b3},
        {"bn1": s1, "bn2": s2, "bn3": s3},
    )


def bottleneck_apply(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY):
    cin, cout = x.shape[-1], p["conv3"]["w"].shape[-1]
    y, n1 = conv_bn(p["conv1"], p["bn1"], s["bn1"], x, train=train, policy=policy)
    y = relu(y)
    y, n2 = conv_bn(p["conv2"], p["bn2"], s["bn2"], y, stride=stride, train=train, policy=policy)
    y = relu(y)
    y, n3 = conv_bn(p["conv3"], p["bn3"], s["bn3"], y, train=train, policy=policy)
    if stride == 1 and cin == cout:
        y = y + x
    y = relu(y)
    return y, {"bn1": n1, "bn2": n2, "bn3": n3}


def fused_mbconv_init(key, cin, cout, k=3, r=4):
    """Fused MBConv for the ResNet search space (reference ``FusedMBConv``,
    ``/root/reference/lib/models/layers/layers.py:67-88``)."""
    from ..arch.schema import make_divisible

    feat = make_divisible(round(cin * r), 8)
    k1, k2 = jax.random.split(key)
    p_inv = conv_init(k1, k, cin, feat)
    b1, s1 = bn_init(feat)
    p_pt = conv_init(k2, 1, feat, cout)
    b2, s2 = bn_init(cout)
    return (
        {"inv": {"conv": p_inv, "bn": b1}, "point": {"conv": p_pt, "bn": b2}},
        {"inv": {"bn": s1}, "point": {"bn": s2}},
    )


def fused_mbconv_apply(p, s, x, stride=1, train=False, policy=DEFAULT_POLICY):
    cin, cout = x.shape[-1], p["point"]["conv"]["w"].shape[-1]
    y, n1 = conv_bn(p["inv"]["conv"], p["inv"]["bn"], s["inv"]["bn"], x,
                    stride=stride, train=train, policy=policy)
    y = relu6(y)
    y, n2 = conv_bn(p["point"]["conv"], p["point"]["bn"], s["point"]["bn"], y,
                    train=train, policy=policy)
    if stride == 1 and cin == cout:
        y = y + x
    return y, {"inv": {"bn": n1}, "point": {"bn": n2}}


def upconv_init(key, cin, cout, k=3):
    """2x nearest-neighbor upsample + conv (reference ``UpConv``,
    ``/root/reference/lib/models/layers/layers.py:58-65``)."""
    return {"conv": conv_init(key, k, cin, cout)}, {}


def upconv_apply(p, s, x, train=False, policy=DEFAULT_POLICY):
    n, h, w, c = x.shape
    # F.interpolate default mode='nearest', scale_factor=2
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = conv(p["conv"], y, policy=policy)
    return y, {}


def jit_init(fn, static_argnames):
    """Wrap a model-init function under ``jax.jit``.

    Init graphs are thousands of tiny RNG/zeros ops; dispatching them
    eagerly dominates model construction on CPU hosts (LitePose-Auto-XS:
    ~21 s eager vs ~1 s jitted-warm on this 1-core host).  Under jit the
    whole init compiles once and lands in the persistent compilation cache
    (utils/compile_cache.py), so test suites and CLI restarts start warm.
    List-valued args are tuple-ified so they hash as static."""
    import functools

    jfn = jax.jit(fn, static_argnames=static_argnames)

    @functools.wraps(fn)
    def wrapped(key, *args, **kwargs):
        args = tuple(tuple(a) if isinstance(a, list) else a for a in args)
        kwargs = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in kwargs.items()}
        return jfn(key, *args, **kwargs)

    return wrapped

"""Model zoo registry.

The reference dispatches by ``eval('models.'+cfg.MODEL.NAME+'.get_pose_net')``
(``/root/reference/dist_train.py:199``); here models register
(init_fn, apply_fn) factories under the same names so experiment YAMLs keep
working, without eval().
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from .litepose import ModelSpec, apply_litepose, init_litepose

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_model(name: str, cfg, arch=None):
    """Returns (init_fn(key) -> (params, state),
    apply_fn(params, state, x, train=False) -> (outputs, new_state))."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg, arch)


@register("pose_mobilenet")
def _litepose(cfg, arch):
    spec = ModelSpec.from_config(cfg)

    def init_fn(key):
        return init_litepose(key, spec, arch, with_skips=True)

    def apply_fn(params, state, x, train=False, policy=None):
        kw = {} if policy is None else {"policy": policy}
        return apply_litepose(params, state, x, spec, arch, train=train, with_skips=True, **kw)

    return init_fn, apply_fn


@register("pose_simplenet")
def _litepose_noskip(cfg, arch):
    """LitePose without raw/skip fusion branches — the architecture ablation
    (``/root/reference/lib/models/pose_simplenet.py``)."""
    spec = ModelSpec.from_config(cfg)

    def init_fn(key):
        return init_litepose(key, spec, arch, with_skips=False)

    def apply_fn(params, state, x, train=False, policy=None):
        kw = {} if policy is None else {"policy": policy}
        return apply_litepose(params, state, x, spec, arch, train=train, with_skips=False, **kw)

    return init_fn, apply_fn


@register("pose_supermobilenet")
def _super_litepose(cfg, arch):
    """One-shot NAS supernet via channel masking at max width
    (``litepose_tpu.models.super_litepose``)."""
    from ..arch.manager import ArchManager
    from .super_litepose import (
        SuperDims,
        apply_super_litepose,
        arch_to_mask_desc,
        init_super_litepose,
    )

    spec = ModelSpec.from_config(cfg)
    manager = ArchManager(deconv_setting=cfg.MODEL.EXTRA.NUM_DECONV_FILTERS)
    dims = SuperDims.from_manager(manager)

    def init_fn(key):
        return init_super_litepose(key, spec, dims)

    def apply_fn(params, state, x, arch=None, train=False, policy=None):
        if arch is None:
            arch = arch_to_mask_desc(manager.max_arch(), manager)
        kw = {} if policy is None else {"policy": policy}
        return apply_super_litepose(params, state, x, arch, spec, dims, train=train, **kw)

    return init_fn, apply_fn


@register("pose_resnet")
def _litepose_resnet(cfg, arch):
    from .litepose_resnet import apply_litepose_resnet, init_litepose_resnet

    spec = ModelSpec.from_config(cfg)
    filters = tuple(cfg.MODEL.EXTRA.NUM_DECONV_FILTERS)
    kernels = tuple(cfg.MODEL.EXTRA.NUM_DECONV_KERNELS)

    def init_fn(key):
        return init_litepose_resnet(key, spec, deconv_filters=filters, deconv_kernels=kernels)

    def apply_fn(params, state, x, train=False, policy=None):
        kw = {} if policy is None else {"policy": policy}
        return apply_litepose_resnet(params, state, x, spec, deconv_kernels=kernels, train=train, **kw)

    return init_fn, apply_fn


@register("pose_superresnet")
def _super_litepose_resnet(cfg, arch):
    from .litepose_resnet import (
        apply_super_litepose_resnet,
        init_super_litepose_resnet,
        resnet_arch_manager,
    )
    from .super_litepose import arch_to_mask_desc

    spec = ModelSpec.from_config(cfg)
    filters = tuple(cfg.MODEL.EXTRA.NUM_DECONV_FILTERS)
    kernels = tuple(cfg.MODEL.EXTRA.NUM_DECONV_KERNELS)
    manager = resnet_arch_manager(deconv_setting=filters)

    def init_fn(key):
        return init_super_litepose_resnet(key, spec, deconv_filters=filters, deconv_kernels=kernels)

    def apply_fn(params, state, x, arch=None, train=False, policy=None):
        if arch is None:
            arch = arch_to_mask_desc(manager.max_arch(), manager)
        kw = {} if policy is None else {"policy": policy}
        return apply_super_litepose_resnet(params, state, x, arch, spec, train=train, **kw)

    return init_fn, apply_fn


@register("pose_higher_hrnet")
def _higher_hrnet(cfg, arch):
    from .higher_hrnet import HRNetSpec, apply_higher_hrnet, init_higher_hrnet

    spec = HRNetSpec.from_config(cfg)

    def init_fn(key):
        return init_higher_hrnet(key, spec)

    def apply_fn(params, state, x, train=False, policy=None):
        kw = {} if policy is None else {"policy": policy}
        return apply_higher_hrnet(params, state, x, spec, train=train, **kw)

    return init_fn, apply_fn


@register("pose_efficient_hrnet")
def _efficient_hrnet(cfg, arch):
    from .efficient_hrnet import (
        EffHRNetSpec,
        apply_efficient_hrnet,
        init_efficient_hrnet,
    )

    spec = EffHRNetSpec.from_config(cfg)

    def init_fn(key):
        return init_efficient_hrnet(key, spec)

    def apply_fn(params, state, x, train=False, policy=None):
        kw = {} if policy is None else {"policy": policy}
        return apply_efficient_hrnet(params, state, x, spec, train=train, **kw)

    return init_fn, apply_fn


def available() -> Tuple[str, ...]:
    return tuple(sorted(_REGISTRY))

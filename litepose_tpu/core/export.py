"""AOT serving artifacts (jax.export) — deploy-without-Python-model-code.

The reference ships deployment as TVM-compiled artifacts plus C++ glue
(``/root/reference/nano_demo/README.md``, ``nano_demo/core/__init__.py:35-80``:
a relay ``.so`` per model, loaded by a generic runtime).  The TPU-native
equivalent is a serialized StableHLO artifact: the WHOLE fused serving
program (normalize -> forward -> stage aggregation -> projection -> NMS ->
top-k -> AE grouping [-> adjust/refine]) with the trained weights baked in
as constants, exported with :mod:`jax.export`.  The artifact

* contains the Mosaic decode kernels when exported for TPU (kernel
  lowering is pinned per-trace via ``StaticGroupCfg.interpret``, so a CPU
  host can build TPU artifacts — no chip needed at export time);
* is loadable by any JAX process (``load_artifact``) with zero framework
  code — model classes, configs, and arch JSONs are not needed at serving
  time, exactly like the reference's ``.so`` flow;
* versions its calling convention through jax.export's serialization
  (shape/dtype-checked at call time).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.group import parse_batch
from .inference import make_infer_fn


@dataclasses.dataclass(frozen=True)
class ArtifactInfo:
    platform: str
    batch: int
    in_hw: Tuple[int, int]
    nbytes: int


def fused_body(engine, in_hw: Optional[Tuple[int, int]] = None,
               interpret: Optional[bool] = None) -> Callable:
    """The engine's fused serving program as a pure function
    ``(params, state, images_u8) -> (people, scores, counts)`` — the same
    body :meth:`PoseEngine.process_batch_square` jits.

    ``interpret`` pins the decode kernels' lowering (False = Mosaic,
    True = Pallas interpreter) via ``StaticGroupCfg.interpret`` so traces
    aimed at another platform are correctly keyed; None follows the host
    backend."""
    cfg = engine.config
    if in_hw is None:
        in_hw = (cfg.input_size, cfg.input_size)
    project_hw = in_hw if cfg.project2image else None
    infer = make_infer_fn(engine.apply_fn, engine.flags,
                          project_hw=project_hw, decode_layout=True)
    gcfg = engine.group_cfg
    if interpret is not None:
        gcfg = gcfg._replace(interpret=interpret)
    wa, wr = cfg.with_adjust, cfg.with_refine

    def fused(params, state, images_u8):
        det, tagt = infer(params, state, images_u8)
        return parse_batch(det, tagt, gcfg, wa, wr, tag_layout="thw")

    return fused


def export_engine(engine, batch: int, in_hw: Optional[Tuple[int, int]] = None,
                  platform: str = "tpu", bake_params: bool = True):
    """Export ``engine``'s fused batched program as a `jax.export.Exported`.

    Inputs: ``(batch, H, W, 3) uint8`` RGB; outputs: people
    ``(B, P, K, 3+T)``, scores ``(B, P)``, counts ``(B,)`` — heatmap
    coordinates, as in :meth:`PoseEngine.process_batch_square`.

    With ``bake_params=True`` (default) the engine's current params/state
    are captured as constants — a self-contained artifact.  Note XLA may
    constant-fold baked weights with a different fp op order than the
    weights-as-arguments program; on real (peaked) heatmaps the decode is
    insensitive to this, but bit-parity with the live engine is only
    guaranteed with ``bake_params=False`` (the artifact then takes
    ``(params, state, images)`` like the live program).
    """
    from jax import export as jexport

    cfg = engine.config
    if in_hw is None:
        in_hw = (cfg.input_size, cfg.input_size)
    fused = fused_body(engine, in_hw, interpret=platform != "tpu")
    params, state = engine.params, engine.state

    x = jax.ShapeDtypeStruct((batch, in_hw[0], in_hw[1], 3), jnp.uint8)
    if bake_params:
        fn = jax.jit(lambda images: fused(params, state, images))
        return jexport.export(fn, platforms=[platform])(x)
    avals = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), (params, state))
    return jexport.export(jax.jit(fused), platforms=[platform])(
        avals[0], avals[1], x)


def save_artifact(exported, path: str) -> ArtifactInfo:
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    # images are the last input (the only one when params are baked)
    b, h, w, _ = exported.in_avals[-1].shape
    return ArtifactInfo(platform=exported.platforms[0], batch=b,
                        in_hw=(h, w), nbytes=len(blob))


def load_artifact(path: str) -> Callable:
    """Load a serialized artifact; returns ``images_u8 -> (people, scores,
    counts)``.  Needs only JAX — no litepose_tpu model code."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)

"""Pallas execution-mode selection.

The decode kernels (pallas_{topk,group,refine,nms}.py) run as Mosaic
kernels on TPU and under the Pallas interpreter elsewhere (CPU tests).
The default follows ``jax.default_backend()`` at trace time; callers that
trace for a DIFFERENT platform (AOT export, core/export.py) pass an
explicit flag instead, threaded through ``StaticGroupCfg.interpret`` —
NEVER a process-global override: the flag is baked into traces, so it must
participate in jit cache keys (a global silently poisons cached traces
across modes).
"""

from __future__ import annotations

from typing import Optional

import jax


def pallas_interpret() -> bool:
    """Default mode: interpreter everywhere but on a real TPU backend."""
    return jax.default_backend() != "tpu"


def resolve_interpret(flag: Optional[bool]) -> bool:
    """``flag`` if explicitly set (True = interpreter, False = Mosaic),
    else the backend default."""
    return pallas_interpret() if flag is None else flag

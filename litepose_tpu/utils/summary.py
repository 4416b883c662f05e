"""Model summary: parameter counts and MACs.

Replaces the reference's ptflops-based ``get_model_summary``
(``/root/reference/lib/utils/utils.py:107-166``): parameters are counted
from the pytree; MACs come from the static analyzer for LitePose archs
(``litepose_tpu.arch.macs``) — no model instantiation or hooks needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def model_summary(params, arch=None, num_joints: int = 14) -> str:
    lines = []
    n = count_params(params)
    lines.append(f"parameters: {n:,} ({n / 1e6:.2f} M)")
    if arch is not None:
        from ..arch.macs import count_litepose_macs

        info = count_litepose_macs(arch, num_joints)
        lines.append(
            f"MACs @ {arch.img_size}x{arch.img_size}: {info['macs'] / 1e9:.2f} G"
        )
        for section, macs in info["breakdown"].items():
            lines.append(f"  {section}: {macs / 1e9:.3f} G")
    return "\n".join(lines)

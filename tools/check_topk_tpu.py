"""On-chip parity drive of the fused NMS+top-k kernel (all variants).

Drives ``nms_topk_pallas`` on the real TPU against its XLA twin
(``heatmap_nms`` + ``lax.top_k``) at the serving resolution (224^2), the
protocol resolution (448^2), and a project2image eval resolution
(512x704 — the shape where plane-chunking and the scaled VMEM limit
matter), for both exact gather variants.  Run after any kernel or
VMEM-budget change: CPU tests execute in interpret mode, which is laxer
than Mosaic (see .claude/skills/verify/SKILL.md).

Run:  python tools/check_topk_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from litepose_tpu.ops.nms import heatmap_nms
    from litepose_tpu.ops.pallas_topk import nms_topk_pallas
    from litepose_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    M = 30
    for (B, K, H, W) in [(2, 14, 224, 224), (2, 14, 448, 448),
                         (1, 14, 512, 704)]:
        det = rng.standard_normal((B, K, H, W)).astype(np.float32)
        det[0, 0, 5, 7] = det[0, 0, 20, 3] = 4.0  # exact ties
        x = jax.device_put(jnp.asarray(det))
        sup = jax.jit(lambda x: heatmap_nms(x, 5, 2).reshape(B, K, H * W))(x)
        want_v, want_i = jax.jit(lambda s: lax.top_k(s, M))(sup)
        want_v, want_i = np.asarray(want_v), np.asarray(want_i)
        for gather in ("vec", "sum"):
            val, pos = nms_topk_pallas(x, M, 5, _gather=gather)
            ok_v = np.array_equal(np.asarray(val), want_v)
            ok_i = np.array_equal(np.asarray(pos), want_i)
            status = "BIT-EXACT" if (ok_v and ok_i) else "DIVERGED"
            print(f"{H}x{W} gather={gather}: {status}")
            assert ok_v and ok_i, f"{H}x{W} gather={gather} diverged on-chip"
    print("all on-chip top-k parity checks passed")


if __name__ == "__main__":
    main()

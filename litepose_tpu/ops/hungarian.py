"""Jittable fixed-size Hungarian (min-cost assignment) solver.

On-device replacement for the host-side Munkres the reference calls per
joint during AE grouping (``/root/reference/lib/core/group.py:19-23``) and
for the O(n^3) Kuhn–Munkres in the C++ deployment path
(``/root/reference/nano_demo/fast_utils/parse/assign.cpp:15-63``).

Implements the potentials + shortest-augmenting-path formulation with
static shapes: an n-row ``lax.fori_loop`` around a ``lax.while_loop``
augmenting search, all column scans vectorized (VPU-friendly — the matrices
are tiny, <=~32x32, so this runs entirely out of registers/VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

INF = jnp.float32(1e18)


@functools.partial(jax.jit, static_argnames=())
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost perfect assignment on a square cost matrix.

    Args:
      cost: (n, n) float32.

    Returns:
      row_to_col: (n,) int32 — column assigned to each row.
    """
    n = cost.shape[0]
    assert cost.shape == (n, n)
    # 1-indexed columns with a sentinel column 0 (standard formulation).
    a = jnp.full((n + 1, n + 1), 0.0, dtype=jnp.float32)
    a = a.at[1:, 1:].set(cost.astype(jnp.float32))

    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((n + 1,), jnp.float32)
    p0 = jnp.zeros((n + 1,), jnp.int32)  # p[j] = row assigned to column j

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), INF)
        used = jnp.zeros((n + 1,), jnp.bool_)
        way = jnp.zeros((n + 1,), jnp.int32)
        j0 = jnp.int32(0)

        def cond(st):
            _, _, _, _, _, j0, p = st
            return p[j0] != 0

        def body(st):
            u, v, minv, used, way, j0, p = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = a[i0] - u[i0] - v  # (n+1,)
            better = (cur < minv) & (~used)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, INF, minv)
            masked = masked.at[0].set(INF)  # column 0 is the sentinel
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials update: used columns raise u[p[j]], lower v[j]
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, minv, used, way, j1, p

        u, v, minv, used, way, j0, p = lax.while_loop(
            cond, body, (u, v, minv, used, way, j0, p)
        )

        # walk back along `way`, flipping the matching
        def aug_cond(st):
            j0, _ = st
            return j0 != 0

        def aug_body(st):
            j0, p = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = lax.while_loop(aug_cond, aug_body, (j0, p))
        return u, v, p

    u, v, p = lax.fori_loop(1, n + 1, assign_row, (u0, v0, p0))

    # invert: row -> col (0-indexed)
    rows = p[1:] - 1  # row (0-idx) assigned to col j-1
    row_to_col = jnp.zeros((n,), jnp.int32)
    row_to_col = row_to_col.at[rows].set(jnp.arange(n, dtype=jnp.int32))
    return row_to_col


def hungarian_np(cost):
    """Numpy oracle via scipy (square matrices)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    r, c = linear_sum_assignment(np.asarray(cost))
    out = np.zeros(cost.shape[0], np.int32)
    out[r] = c
    return out

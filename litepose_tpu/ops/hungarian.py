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


def hungarian_prefix(cost: jnp.ndarray, n_rows) -> jnp.ndarray:
    """Assign the first ``n_rows`` rows of an (n, n) cost matrix to distinct
    columns with minimum total cost.

    Rows beyond ``n_rows`` are left unassigned (their output is the column
    count, an invalid index) — equivalent to munkres' zero-padded dummy rows,
    which never constrain the real rows' optimum.  Because the grouping's
    peak rows arrive sorted by detection score, valid rows are always a
    prefix, and augmenting only those cuts the sequential iteration count by
    the invalid fraction (the dominant decode cost on TPU).

    Args:
      cost: (n, n) float32.
      n_rows: traced int — number of leading rows to assign.

    Returns:
      row_to_col: (n,) int32; rows >= n_rows (or unassigned) get ``n``.
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

    def outer_cond(carry):
        i, _, _, _ = carry
        return i <= jnp.asarray(n_rows, jnp.int32)

    def outer_body(carry):
        i, u, v, p = carry
        u, v, p = assign_row(i, (u, v, p))
        return i + 1, u, v, p

    _, u, v, p = lax.while_loop(outer_cond, outer_body, (jnp.int32(1), u0, v0, p0))

    # invert: row -> col (0-indexed); unassigned rows get n (invalid)
    rows = p[1:] - 1  # row (0-idx) assigned to col j-1
    row_to_col = jnp.full((n + 1,), n, jnp.int32)
    cols = jnp.arange(n, dtype=jnp.int32)
    row_to_col = row_to_col.at[jnp.where(rows >= 0, rows, n)].set(
        jnp.where(rows >= 0, cols, n), mode="drop"
    )
    return row_to_col[:n]


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Full square min-cost assignment (all rows). Returns (n,) col per row."""
    return hungarian_prefix(cost, cost.shape[0])


def greedy_assign(cost: jnp.ndarray, n_rows) -> jnp.ndarray:
    """Fixed-iteration greedy min-cost matching (serving fast path).

    Repeatedly takes the globally cheapest available (row, col) pair.  Not
    always the Hungarian optimum, but agrees on the vast majority of AE
    grouping steps (costs are dominated by the quantized tag-distance term);
    unlike the augmenting-path solver its cost is data-independent, so a
    vmapped batch has no lockstep worst-case straggler.

    Args:
      cost: (n, n) float32; n_rows: rows to assign (prefix).

    Returns (n,) int32 col per row; unassigned rows get n.
    """
    n = cost.shape[0]
    big = jnp.float32(3e38)
    row_ids = jnp.arange(n, dtype=jnp.int32)
    row_valid = row_ids < jnp.asarray(n_rows, jnp.int32)
    c = jnp.where(row_valid[:, None], cost.astype(jnp.float32), big)

    def body(_, carry):
        c, assign = carry
        flat = jnp.argmin(c)
        r = (flat // n).astype(jnp.int32)
        col = (flat % n).astype(jnp.int32)
        ok = c[r, col] < big
        assign = jnp.where(ok, assign.at[r].set(col), assign)
        row_mask = (row_ids == r) & ok
        col_mask = (row_ids == col) & ok
        c = jnp.where(row_mask[:, None] | col_mask[None, :], big, c)
        return c, assign

    assign0 = jnp.full((n,), n, jnp.int32)
    _, assign = lax.fori_loop(0, n, body, (c, assign0))
    return assign


def hungarian_np(cost):
    """Numpy oracle via scipy (square matrices)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    r, c = linear_sum_assignment(np.asarray(cost))
    out = np.zeros(cost.shape[0], np.int32)
    out[r] = c
    return out

"""Jittable Hungarian assignment (Jonker–Volgenant shortest augmenting path).

TPU-native replacement for the reference's HungarianAssigner3D
(third_party/bev_mmdet3d/core/bbox/assigners), which calls scipy's
linear_sum_assignment on host.  Host callbacks don't compose with pjit over a
mesh, so here the O(R·C·iters) algorithm runs entirely inside XLA with
`lax.while_loop`s — R (number of GT boxes, padded to a static max) is tiny
(≤ a few dozen) and C is num_query (900), so the sequential row loop costs
microseconds next to the model forward.

Padding convention: rows whose cost is all-constant (e.g. padded GTs with a
zero cost row) do not perturb the optimum of the real rows — a constant row
adds the same total regardless of which column it takes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(1e9)


@jax.jit
def hungarian_assign(cost: jax.Array) -> jax.Array:
    """Minimum-cost row->column assignment.

    Args:
      cost: [R, C] float cost matrix, R <= C (rows = GT boxes, cols = queries).
    Returns:
      [R] int32 array, row2col[i] = column assigned to row i (all distinct).
    """
    R, C = cost.shape
    assert R <= C, "hungarian_assign requires rows <= cols"
    cost = cost.astype(jnp.float32)
    # 1-indexed working arrays with a virtual 0 row/col (e-maxx formulation).
    cost1 = jnp.zeros((R + 1, C + 1), jnp.float32).at[1:, 1:].set(cost)

    def assign_row(i, state):
        u, v, p = state
        p = p.at[0].set(i)
        minv = jnp.full(C + 1, _INF)
        used = jnp.zeros(C + 1, bool)
        way = jnp.zeros(C + 1, jnp.int32)

        def cond(carry):
            _, _, p, _, _, _, j0 = carry
            return p[j0] != 0

        def body(carry):
            u, v, p, way, minv, used, j0 = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost1[i0] - u[i0] - v  # [C+1]
            better = (cur < minv) & jnp.logical_not(used)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # dual update: used cols' rows gain delta, used cols lose delta
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return (u, v, p, way, minv, used, j1)

        u, v, p, way, _, _, j0 = lax.while_loop(
            cond, body, (u, v, p, way, minv, used, jnp.int32(0))
        )

        def aug_cond(carry):
            _, j0 = carry
            return j0 != 0

        def aug_body(carry):
            p, j0 = carry
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    u0 = jnp.zeros(R + 1, jnp.float32)
    v0 = jnp.zeros(C + 1, jnp.float32)
    p0 = jnp.zeros(C + 1, jnp.int32)
    _, _, p = lax.fori_loop(1, R + 1, assign_row, (u0, v0, p0))

    # invert: p[j] = row assigned to col j  ->  row2col[row-1] = j-1
    rows = jnp.where(p[1:] > 0, p[1:] - 1, R)  # dump unassigned into slot R
    row2col = jnp.zeros(R + 1, jnp.int32).at[rows].set(jnp.arange(C, dtype=jnp.int32))
    return row2col[:R]

"""Linear assignment on device (Jonker–Volgenant shortest augmenting path).

The reference solves Hungarian matching with scipy's linear_sum_assignment on
the CPU (pcdet/models/dense_heads/target_assigner/hungarian_assigner.py:118,
/root/reference), forcing a device->host sync in the middle of every training
step. Here the same optimal assignment runs as a fixed-shape lax program so
the whole step stays on device.

Convention: cost (N_ROWS, N_COLS) with rows the scarce side (gts) and
cols the abundant side (proposals), N_ROWS <= N_COLS after masking. Invalid
rows (padding) are skipped. Returns, for each column, the matched row index
or -1 — i.e. proposal -> gt assignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = 1e18


@jax.jit
def solve_lap(cost, row_valid):
    """cost: (N, M) float; row_valid: (N,) bool. Optimal min-cost matching of
    every valid row to a distinct column (requires #valid <= M).

    Returns col_to_row: (M,) int32, -1 where unmatched.
    """
    n, m = cost.shape
    cost = cost.astype(jnp.float64) if cost.dtype == jnp.float64 else cost.astype(jnp.float32)

    # columns padded with a virtual column 0 => arrays of size m+1, col j is j+1
    # p[j]: row matched to column j (0 = none, rows are 1-indexed internally)
    def augment_row(state, i):
        u, v, p = state  # u: (n+1,), v: (m+1,), p: (m+1,) int32

        def do(u, v, p):
            minv = jnp.full((m + 1,), INF, cost.dtype).at[0].set(-INF)
            used = jnp.zeros((m + 1,), bool)
            way = jnp.zeros((m + 1,), jnp.int32)
            p = p.at[0].set(i + 1)
            j0 = jnp.int32(0)

            def cond(carry):
                u, v, p, minv, used, way, j0 = carry
                return p[j0] != 0

            def body(carry):
                u, v, p, minv, used, way, j0 = carry
                used = used.at[j0].set(True)
                i0 = p[j0]  # 1-indexed row
                cur = cost[i0 - 1, :] - u[i0] - v[1:]  # (m,)
                cur = jnp.where(used[1:], INF, cur)
                better = cur < minv[1:]
                minv = minv.at[1:].set(jnp.where(better, cur, minv[1:]))
                way = way.at[1:].set(jnp.where(better, j0, way[1:]))
                masked = jnp.where(used[1:], INF, minv[1:])
                j1 = jnp.argmin(masked).astype(jnp.int32) + 1
                delta = masked[j1 - 1]
                u = u.at[p].add(jnp.where(used, delta, 0.0))
                v = v - jnp.where(used, delta, 0.0)
                minv = minv.at[1:].set(
                    jnp.where(used[1:], minv[1:], minv[1:] - delta)
                )
                return (u, v, p, minv, used, way, j1)

            u, v, p, minv, used, way, j0 = jax.lax.while_loop(
                cond, body, (u, v, p, minv, used, way, j0)
            )

            # backtrack augmenting path
            def bt_cond(carry):
                p, j0 = carry
                return j0 != 0

            def bt_body(carry):
                p, j0 = carry
                j1 = way[j0]
                p = p.at[j0].set(p[j1])
                return (p, j1)

            p, _ = jax.lax.while_loop(bt_cond, bt_body, (p, j0))
            return u, v, p

        u, v, p = jax.lax.cond(row_valid[i], do, lambda u, v, p: (u, v, p), u, v, p)
        return (u, v, p), None

    u0 = jnp.zeros((n + 1,), cost.dtype)
    v0 = jnp.zeros((m + 1,), cost.dtype)
    p0 = jnp.zeros((m + 1,), jnp.int32)
    (u, v, p), _ = jax.lax.scan(augment_row, (u0, v0, p0), jnp.arange(n))

    col_to_row = p[1:] - 1  # back to 0-indexed rows, -1 = unmatched
    return col_to_row.astype(jnp.int32)

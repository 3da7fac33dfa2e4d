"""Linear sum assignment: scipy on host, Jonker-Volgenant in JAX on device.

The reference relies on scipy's ``linear_sum_assignment``
(step3_crossframematching.py:723) and boxmot's internal matcher. Instances
are tiny (<= 16x16), so the host path uses scipy; the JAX path provides the
same optimum with static shapes for fully on-device association (verified
against scipy over randomized problems in tests).
"""

from __future__ import annotations

import numpy as np


def hungarian(cost: np.ndarray):
    """Host assignment: rows->cols minimizing total cost. Returns
    (row_idx, col_idx) like scipy."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost)


def hungarian_jax(cost):
    """Shortest-augmenting-path assignment (Jonker-Volgenant) in JAX.

    cost: (N, M) float with N <= M. Returns col4row (N,) int32.
    Static shapes; the inner Dijkstra runs at most M steps per row.
    """
    import jax
    import jax.numpy as jnp

    cost = jnp.asarray(cost, jnp.float32)
    N, M = cost.shape
    INF = jnp.float32(jnp.inf)

    def solve_row(carry, cur_row):
        cur_row = cur_row.astype(jnp.int32)
        u, v, col4row, row4col = carry

        # --- Dijkstra over columns to find an augmenting path ---
        sp = jnp.full((M,), INF)          # shortest path cost to each col
        path = jnp.full((M,), -1, jnp.int32)  # predecessor ROW of each col
        done_cols = jnp.zeros((M,), bool)     # scanned columns
        row_min = jnp.full((N,), INF)         # sp value when a row was scanned

        def cond(s):
            _, _, _, _, sink, _, _, _ = s
            return sink < 0

        def body(s):
            sp, path, done_cols, row_min, sink, i, min_val, _ = s
            red = min_val + cost[i] - u[i] - v          # (M,)
            better = (~done_cols) & (red < sp)
            sp = jnp.where(better, red, sp)
            path = jnp.where(better, i, path).astype(jnp.int32)
            masked = jnp.where(done_cols, INF, sp)
            # prefer unassigned columns on ties (scipy tie-break)
            j = jnp.argmin(masked - jnp.where(row4col < 0, 1e-9, 0.0))
            j = j.astype(jnp.int32)
            min_val2 = masked[j]
            done_cols2 = done_cols.at[j].set(True)
            row_min2 = row_min.at[i].set(min_val)
            nxt = row4col[j]
            sink2 = jnp.where(nxt < 0, j, -1).astype(jnp.int32)
            return (sp, path, done_cols2, row_min2, sink2,
                    jnp.where(nxt < 0, i, nxt).astype(jnp.int32),
                    min_val2.astype(jnp.float32), j)

        init = (sp, path, done_cols, row_min, jnp.int32(-1), cur_row,
                jnp.float32(0.0), jnp.int32(-1))
        sp, path, done_cols, row_min, sink, _, delta, _ = (
            jax.lax.while_loop(cond, body, init)
        )

        # --- dual updates ---
        u = u.at[cur_row].add(delta)
        scanned_rows = row_min < INF
        other = scanned_rows & (jnp.arange(N) != cur_row)
        sp_of_row = jnp.where(
            col4row >= 0, sp[jnp.clip(col4row, 0)], 0.0
        )
        u = jnp.where(other, u + delta - sp_of_row, u)
        v = jnp.where(done_cols, v + sp - delta, v)

        # --- augment: walk predecessors from the sink ---
        def aug_cond(s):
            j, _, _, again = s
            return again

        def aug_body(s):
            j, col4row, row4col, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_prev = col4row[i]
            col4row = col4row.at[i].set(j)
            return j_prev, col4row, row4col, i != cur_row

        _, col4row, row4col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, True)
        )
        return (u, v, col4row, row4col), None

    u = jnp.zeros((N,), jnp.float32)
    v = jnp.zeros((M,), jnp.float32)
    col4row = jnp.full((N,), -1, jnp.int32)
    row4col = jnp.full((M,), -1, jnp.int32)
    (u, v, col4row, row4col), _ = jax.lax.scan(
        solve_row, (u, v, col4row, row4col), jnp.arange(N)
    )
    return col4row

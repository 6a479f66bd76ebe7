"""Exact linear sum assignment (Hungarian / Jonker–Volgenant) in pure JAX.

The reference runs scipy's `linear_sum_assignment` on the CPU
(`src/models/matcher.py:106,210`), which would force a host round-trip inside
every training step. The axon TPU runtime additionally has no host-callback
support, so the TPU-native answer is a jittable exact solver: the classic
shortest-augmenting-path algorithm with dual potentials (O(n²·m)), expressed
with `lax.fori_loop`/`lax.while_loop`. For DETR-sized problems
(≤100 targets × ≤300 queries) this is microseconds of work and removes the
device→host→device bounce entirely.

Convention: ``cost`` is (n_rows, n_cols) with n_rows ≤ n_cols; every row gets a
distinct column; returns ``col_for_row`` (n_rows,) int32. Exactly optimal
(same total cost as scipy; tie-breaking may differ).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)


@functools.partial(jax.jit, static_argnames=())
def lsa(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment. cost: (n, m), n <= m. Returns (n,) int32."""
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    n, m = cost.shape
    assert n <= m, f"lsa expects n_rows <= n_cols, got {cost.shape}"

    # Arrays are 1-indexed over columns with a virtual column 0
    # (shortest-augmenting-path formulation with potentials u, v).
    # p[j]: row currently assigned to column j (0 = free); p[0] = active row.
    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((m + 1,), jnp.float32)
    p0 = jnp.zeros((m + 1,), jnp.int32)

    # Pad cost with a row 0 and column 0 so 1-indexing is direct.
    c = jnp.full((n + 1, m + 1), 0.0, jnp.float32)
    c = c.at[1:, 1:].set(cost)

    col_ids = jnp.arange(m + 1, dtype=jnp.int32)

    def assign_row(i, state):
        u, v, p = state
        i = i + 1  # 1-indexed row

        minv = jnp.full((m + 1,), INF)
        used = jnp.zeros((m + 1,), bool)
        way = jnp.zeros((m + 1,), jnp.int32)
        p = p.at[0].set(i)
        j0 = jnp.int32(0)

        def search_cond(s):
            u, v, p, minv, used, way, j0 = s
            return p[j0] != 0

        def search_body(s):
            u, v, p, minv, used, way, j0 = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = c[i0] - u[i0] - v                      # (m+1,)
            better = (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, INF, minv)
            masked = masked.at[0].set(INF)               # virtual col never target
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # Update potentials: used columns shift (u[p[j]] += delta, v[j] -= delta),
            # unused columns reduce their tentative distance.
            du = jnp.zeros((n + 1,), jnp.float32)
            du = du.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0))
            du = du.at[0].set(0.0)
            u = u + du
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return (u, v, p, minv, used, way, j1)

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            search_cond, search_body, (u, v, p, minv, used, way, j0))

        # Backtrack the augmenting path: p[j0] = p[way[j0]] until j0 == 0.
        def back_cond(s):
            p, j0 = s
            return j0 != 0

        def back_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(back_cond, back_body, (p, j0))
        return (u, v, p)

    _, _, p = jax.lax.fori_loop(0, n, assign_row, (u0, v0, p0))

    # p[j] (1..m) holds the 1-indexed row assigned to column j; invert.
    col_for_row = jnp.zeros((n + 1,), jnp.int32)
    col_for_row = col_for_row.at[p].set(col_ids)
    return col_for_row[1:] - 1


def lsa_batched(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (B, n, m) → (B, n) int32 column assignment per row."""
    return jax.vmap(lsa)(cost)

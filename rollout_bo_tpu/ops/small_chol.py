"""Unrolled small-matrix Cholesky / triangular solves.

XLA lowers `jnp.linalg.cholesky` and `solve_triangular` to "Cholesky" /
"InvertDiagBlocksLowerTriangular" custom calls on TPU. For the tiny
systems in the rollout hot path — the (d, d) Newton direction solve and
the (d+1, d+1) joint-draw factorization, batched over tens of thousands
of (trajectory, start) lanes — those custom calls dominated the whole
program (84% of the inner acquisition solve in profiler traces, on
f32[1600,10,2,10,10] inputs).

These helpers unroll the factorization/substitution over the (static,
small) dimension into scalar arithmetic. Under the surrounding vmaps each
"scalar" is a (batch,) vector, so the whole thing compiles to plain fused
VPU ops across the batch — no custom call, no sequential blocked
substitution. Not-PD inputs yield NaNs (sqrt of a negative), matching
jnp.linalg.cholesky's NaN contract, so callers' finite-ness guards work
unchanged.

Use only for d <= ~32 (unrolled op count grows as d^3/6; `spd_solve`
falls back to the library path above the threshold).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "UNROLL_LIMIT",
    "chol_small",
    "solve_lower_small",
    "solve_upper_small",
    "spd_solve_small",
]

UNROLL_LIMIT = 32


def chol_small(A: jax.Array) -> jax.Array:
    """Lower Cholesky factor of a small SPD matrix (d, d), unrolled.

    NaN entries when A is not PD (like jnp.linalg.cholesky).
    """
    d = A.shape[-1]
    L = [[None] * d for _ in range(d)]
    for j in range(d):
        s = A[..., j, j] - sum((L[j][k] * L[j][k] for k in range(j)), start=0.0)
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, d):
            t = A[..., i, j] - sum((L[i][k] * L[j][k] for k in range(j)), start=0.0)
            L[i][j] = t * inv
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(d)], axis=-1)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=-2)


def solve_lower_small(L: jax.Array, b: jax.Array) -> jax.Array:
    """L z = b by unrolled forward substitution; L (d, d), b (d,)."""
    d = L.shape[-1]
    z = [None] * d
    for i in range(d):
        acc = b[..., i] - sum((L[..., i, k] * z[k] for k in range(i)), start=0.0)
        z[i] = acc / L[..., i, i]
    return jnp.stack(z, axis=-1)


def solve_upper_small(L: jax.Array, b: jax.Array) -> jax.Array:
    """L^T z = b by unrolled back substitution; L (d, d) lower, b (d,)."""
    d = L.shape[-1]
    z = [None] * d
    for i in reversed(range(d)):
        acc = b[..., i] - sum((L[..., k, i] * z[k] for k in range(i + 1, d)), start=0.0)
        z[i] = acc / L[..., i, i]
    return jnp.stack(z, axis=-1)


def spd_solve_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """A^{-1} b for small SPD A via unrolled Cholesky; NaN if not PD.

    Falls back to the library Cholesky/solve path above UNROLL_LIMIT.
    """
    d = A.shape[-1]
    if d > UNROLL_LIMIT:
        L = jnp.linalg.cholesky(A)
        z = solve_triangular(L, b, lower=True)
        return solve_triangular(L, z, lower=True, trans=1)
    L = chol_small(A)
    return solve_upper_small(L, solve_lower_small(L, b))

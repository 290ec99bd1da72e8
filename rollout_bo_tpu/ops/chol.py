"""Masked fixed-capacity Cholesky factorizations and rank-1 row appends.

The reference keeps fixed-capacity (capacity x capacity) buffers with an
"active count" and performs rank-1 Schur-complement updates in place
(radial_basis_surrogates.jl:77-118, 186-204). That layout is exactly XLA's
static-shape requirement; here the same math is expressed as pure functions
on padded arrays with an **identity-padding invariant**:

    L[i, j] = delta_ij  for i >= n  (inactive rows/cols),

so that triangular solves against the full padded factor with zero-padded
right-hand sides return exactly the active-block solution with zero
padding — no masking inside the solve, and everything batches cleanly
under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "masked_cholesky",
    "cho_solve_padded",
    "solve_lower",
    "solve_upper",
    "chol_append_row",
    "tri_inv_padded",
    "psd_apply",
    "chol_append_row_with_inv",
    "active_mask",
]


def active_mask(capacity: int, n, dtype=bool):
    """Boolean mask of length `capacity` with the first `n` entries True."""
    return (jnp.arange(capacity) < n).astype(dtype)


def masked_cholesky(K: jax.Array, n) -> jax.Array:
    """Cholesky of the active n x n block of K, identity in the padding.

    K: (cap, cap) full padded covariance (values outside the active block
    are ignored). Returns L (cap, cap) lower-triangular with L[i,i] = 1 for
    i >= n. Mirrors the reference's initial factorization
    (radial_basis_surrogates.jl:93-98) for any active count.
    """
    cap = K.shape[0]
    m = active_mask(cap, n)
    both = jnp.outer(m, m)
    eye = jnp.eye(cap, dtype=K.dtype)
    Kp = jnp.where(both, K, eye)
    return jnp.linalg.cholesky(Kp)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """L z = b with identity-padded L and zero-padded b (returns padded z)."""
    return solve_triangular(L, b, lower=True)


def solve_upper(L: jax.Array, b: jax.Array) -> jax.Array:
    """L^T z = b with identity-padded L and zero-padded b."""
    return solve_triangular(L, b, lower=True, trans=1)


def cho_solve_padded(L: jax.Array, b: jax.Array) -> jax.Array:
    """(L L^T)^{-1} b for identity-padded L, zero-padded b."""
    return solve_upper(L, solve_lower(L, b))


def chol_append_row(L: jax.Array, kvec: jax.Array, kdiag, n) -> jax.Array:
    """Append one observation to an identity-padded Cholesky factor.

    Given L = chol(K_active) (identity-padded, active count n), the new
    covariance column `kvec` (cap, zero beyond the first n entries) and the
    new diagonal entry `kdiag` (= psi(0) + noise), returns the factor with
    active count n+1:

        l21 = L^{-1} kvec_active,   l22 = sqrt(kdiag - ||l21||^2)

    This is the reference's Schur-complement update
    (radial_basis_surrogates.jl:186-204) as a pure function.
    """
    cap = L.shape[0]
    m = active_mask(cap, n, dtype=L.dtype)
    b = kvec * m
    l21 = solve_lower(L, b)  # zero beyond n by the padding invariant
    l22 = jnp.sqrt(jnp.maximum(kdiag - jnp.dot(l21, l21), 1e-12))

    cols = jnp.arange(cap)
    new_row = jnp.where(cols < n, l21, jnp.where(cols == n, l22, 0.0))
    rows = cols[:, None]
    return jnp.where(rows == n, new_row[None, :], L)


# --------------------------------------------------------------------------
# Explicit triangular inverse: turns every hot-path triangular solve into a
# matmul. On TPU a batched triangular solve lowers to sequential blocked
# substitution; L changes only at (rare) conditioning events while posterior
# evaluations against it happen thousands of times per trajectory step, so
# maintaining Li = L^{-1} incrementally moves the entire posterior hot path
# onto the MXU. Backward error grows from O(eps·cond(L)) componentwise to
# O(eps·cond(L)) normwise — indistinguishable here thanks to the noise
# jitter on K's diagonal (reference sigma_n^2 = 1e-6, rbs.jl:83).
# --------------------------------------------------------------------------


def tri_inv_padded(L: jax.Array) -> jax.Array:
    """Inverse of an identity-padded lower-triangular factor.

    The padding is preserved: L = blockdiag(L_active, I) implies
    L^{-1} = blockdiag(L_active^{-1}, I).
    """
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return solve_triangular(L, eye, lower=True)


def psd_apply(Li: jax.Array, b: jax.Array) -> jax.Array:
    """(L L^T)^{-1} b as two matmuls with Li = L^{-1} (zero-padded b)."""
    return Li.T @ (Li @ b)


def chol_append_row_with_inv(L, Li, kvec, kdiag, n):
    """`chol_append_row` that also maintains the explicit inverse.

    Appending row [l21^T, l22] to L updates the inverse as

        Li_new = [[Li, 0], [-(1/l22) l21^T Li, 1/l22]],

    i.e. only row n changes: Li_new[n, :n] = -(l21^T Li)/l22,
    Li_new[n, n] = 1/l22. l21 itself is the matvec Li @ kvec (this replaces
    the triangular solve in `chol_append_row`). Returns (L_new, Li_new).
    """
    cap = L.shape[0]
    m = active_mask(cap, n, dtype=L.dtype)
    b = kvec * m
    l21 = Li @ b  # = L^{-1} kvec_active, zero-padded
    l22 = jnp.sqrt(jnp.maximum(kdiag - jnp.dot(l21, l21), 1e-12))
    il22 = 1.0 / l22

    cols = jnp.arange(cap)
    rows = cols[:, None]
    new_row_L = jnp.where(cols < n, l21, jnp.where(cols == n, l22, 0.0))
    L_new = jnp.where(rows == n, new_row_L[None, :], L)

    li_row = -(l21 @ Li) * il22  # (cap,), zero beyond n by padding
    new_row_Li = jnp.where(cols < n, li_row, jnp.where(cols == n, il22, 0.0))
    Li_new = jnp.where(rows == n, new_row_Li[None, :], Li)
    return L_new, Li_new

"""Unrolled small-matrix Cholesky/substitution vs the library path.

These unrolled kernels replace XLA's "Cholesky"/triangular-solve custom
calls in the rollout hot path (see ops/small_chol.py); they must agree
with the library results to machine precision and preserve the NaN
contract for non-PD inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.ops import small_chol


@pytest.mark.parametrize("d", [1, 2, 5, 10, 11, 16])
def test_chol_and_solve_match_library(d):
    rng = np.random.default_rng(d)
    M = rng.normal(size=(d, d))
    A = M @ M.T + d * np.eye(d)
    b = rng.normal(size=(d,))
    L = np.asarray(small_chol.chol_small(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-10, atol=1e-12)
    z = np.asarray(small_chol.solve_lower_small(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(L @ z, b, rtol=1e-9, atol=1e-12)
    u = np.asarray(small_chol.solve_upper_small(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(L.T @ u, b, rtol=1e-9, atol=1e-12)
    p = np.asarray(small_chol.spd_solve_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(p, np.linalg.solve(A, b), rtol=1e-9, atol=1e-12)


def test_vmapped_batch():
    rng = np.random.default_rng(3)
    A = np.stack([M @ M.T + 5 * np.eye(5) for M in rng.normal(size=(7, 5, 5))])
    b = rng.normal(size=(7, 5))
    p = np.asarray(jax.vmap(small_chol.spd_solve_small)(jnp.asarray(A), jnp.asarray(b)))
    ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(7)])
    np.testing.assert_allclose(p, ref, rtol=1e-9)


def test_non_pd_gives_nan():
    assert np.isnan(np.asarray(small_chol.chol_small(-jnp.eye(3)))).any()
    p = np.asarray(small_chol.spd_solve_small(-jnp.eye(3), jnp.ones(3)))
    assert np.isnan(p).any()


def test_gradients_flow():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(4, 4)) @ np.eye(4) + 10 * np.eye(4))

    def f(A):
        return small_chol.spd_solve_small(A, jnp.ones(4)).sum()

    g = np.asarray(jax.grad(f)(A))
    assert np.isfinite(g).all()
    # FD check
    eps = 1e-6
    E = np.zeros((4, 4)); E[1, 2] = 1.0
    fd = (f(A + eps * E) - f(A - eps * E)) / (2 * eps)
    np.testing.assert_allclose(g[1, 2], fd, rtol=1e-5)


def test_fallback_above_limit():
    d = small_chol.UNROLL_LIMIT + 2
    rng = np.random.default_rng(9)
    M = rng.normal(size=(d, d))
    A = M @ M.T + d * np.eye(d)
    b = rng.normal(size=(d,))
    p = np.asarray(small_chol.spd_solve_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(p, np.linalg.solve(A, b), rtol=1e-8)

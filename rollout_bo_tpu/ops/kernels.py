"""Stationary RBF kernel families and batched kernel-matrix assembly.

TPU-native re-design of the reference's kernel layer
(`/root/reference/radial_basis_functions.jl`):

- Each family is a scalar profile psi(rho, theta); all rho/theta derivatives
  are derived with `jax.grad` at trace time (the reference uses ForwardDiff,
  radial_basis_functions.jl:41-46).
- The O(N^2) assembly loops (radial_basis_functions.jl:161-208) become
  broadcast/vmap expressions that XLA fuses and tiles onto the VPU/MXU.
- Points are stored row-major `(N, d)` (the reference is column-major
  `(d, N)`); all matrices keep the reference's semantics transposed
  accordingly.

Shapes are static everywhere; "active subset" masking is handled by the
surrogate layer, not here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "RBFKernel",
    "matern52",
    "matern32",
    "matern12",
    "squared_exponential",
    "periodic",
    "kernel_value",
    "kernel_grad",
    "kernel_hess",
    "kernel_joint_block",
    "eval_KXX",
    "eval_KxX",
    "eval_grad_KxX",
    "eval_dKXX",
    "eval_dKxX",
    "eval_dgrad_KxX",
    "eval_Dtheta_KXX",
]

_EPS = 1e-14


# --------------------------------------------------------------------------
# Scalar kernel profiles psi(rho, theta)
# --------------------------------------------------------------------------

def _psi_matern52(rho, theta):
    # reference: radial_basis_functions.jl:60-68
    s = (jnp.sqrt(5.0) / theta[0]) * rho
    return (1.0 + s * (1.0 + s / 3.0)) * jnp.exp(-s)


def _psi_matern32(rho, theta):
    # reference: radial_basis_functions.jl:70-78
    s = (jnp.sqrt(3.0) / theta[0]) * rho
    return (1.0 + s) * jnp.exp(-s)


def _psi_matern12(rho, theta):
    # reference: radial_basis_functions.jl:80-88
    return jnp.exp(-rho / theta[0])


def _psi_squared_exponential(rho, theta):
    # reference: radial_basis_functions.jl:90-96
    return jnp.exp(-(rho**2) / (2.0 * theta[0] ** 2))


def _psi_periodic(rho, theta):
    # reference: radial_basis_functions.jl:98-103
    return jnp.exp(-2.0 * jnp.sin(jnp.pi * rho / theta[1]) ** 2 / theta[0] ** 2)


_PROFILES: dict[str, Callable] = {
    "matern52": _psi_matern52,
    "matern32": _psi_matern32,
    "matern12": _psi_matern12,
    "squared_exponential": _psi_squared_exponential,
    "periodic": _psi_periodic,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RBFKernel:
    """A stationary RBF kernel: profile name (static) + hyperparameters.

    Mirrors the reference `RadialBasisFunction` struct
    (radial_basis_functions.jl:7-14) but is an immutable pytree; the
    rho/theta derivative closures are derived on demand with `jax.grad`.
    """

    theta: jax.Array
    kind: str = dataclasses.field(default="matern52", metadata=dict(static=True))

    # -- scalar profile and derivatives ------------------------------------
    def psi(self, rho):
        return _PROFILES[self.kind](rho, self.theta)

    def dpsi(self, rho):
        return jax.grad(lambda r: _PROFILES[self.kind](r, self.theta))(rho)

    def d2psi(self, rho):
        return jax.grad(jax.grad(lambda r: _PROFILES[self.kind](r, self.theta)))(rho)

    def dtheta_psi(self, rho):
        return jax.grad(lambda th: _PROFILES[self.kind](rho, th))(self.theta)

    def replace_theta(self, theta) -> "RBFKernel":
        return RBFKernel(theta=jnp.asarray(theta), kind=self.kind)


def matern52(theta=(1.0,)) -> RBFKernel:
    return RBFKernel(theta=jnp.asarray(theta, dtype=float), kind="matern52")


def matern32(theta=(1.0,)) -> RBFKernel:
    return RBFKernel(theta=jnp.asarray(theta, dtype=float), kind="matern32")


def matern12(theta=(1.0,)) -> RBFKernel:
    return RBFKernel(theta=jnp.asarray(theta, dtype=float), kind="matern12")


def squared_exponential(theta=(1.0,)) -> RBFKernel:
    return RBFKernel(theta=jnp.asarray(theta, dtype=float), kind="squared_exponential")


def periodic(theta=(1.0, 1.0)) -> RBFKernel:
    return RBFKernel(theta=jnp.asarray(theta, dtype=float), kind="periodic")


# --------------------------------------------------------------------------
# Pointwise kernel evaluations (value / gradient / Hessian / joint block)
# --------------------------------------------------------------------------

def _safe_norm(r):
    """norm(r) with a NaN-free gradient at r = 0."""
    sq = jnp.sum(r * r)
    return jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)) * jnp.where(sq > 0.0, 1.0, 0.0)


def kernel_value(k: RBFKernel, r: jax.Array):
    """psi(||r||) — reference eval_k (radial_basis_functions.jl:120)."""
    return k.psi(_safe_norm(r))


def kernel_grad(k: RBFKernel, r: jax.Array):
    """d/dr psi(||r||) = psi'(rho) * r/rho, 0 at rho=0.

    reference: eval_∇k (radial_basis_functions.jl:127-134).
    """
    rho = _safe_norm(r)
    safe = jnp.where(rho > _EPS, rho, 1.0)
    return jnp.where(rho > _EPS, k.dpsi(safe) / safe, 0.0) * r


def kernel_hess(k: RBFKernel, r: jax.Array):
    """Hessian of psi(||r||); psi''(0) * I at rho=0.

    reference: eval_Hk (radial_basis_functions.jl:141-150).
    """
    d = r.shape[0]
    rho = _safe_norm(r)
    safe = jnp.where(rho > _EPS, rho, 1.0)
    rhat = r / safe
    dpsi_over_rho = k.dpsi(safe) / safe
    d2psi = k.d2psi(safe)
    away = (d2psi - dpsi_over_rho) * jnp.outer(rhat, rhat) + dpsi_over_rho * jnp.eye(d, dtype=r.dtype)
    at0 = k.d2psi(jnp.zeros((), dtype=r.dtype)) * jnp.eye(d, dtype=r.dtype)
    return jnp.where(rho > _EPS, away, at0)


def hess_contraction(k: RBFKernel, x: jax.Array, X: jax.Array, coeff: jax.Array):
    """sum_n coeff_n * Hess_x k(x - X_n), without materializing (N, d, d).

    For a stationary radial kernel Hess k(r) = b(rho) r r^T + a(rho) I with
    a = psi'(rho)/rho and b = (psi''(rho) - a)/rho^2, so the contraction
    factors into one scalar reduction plus a (d, N) @ (N, d) matmul —
    MXU-friendly and O(N d^2) memory-free, vs the naive (N, d, d) einsum
    that dominated HBM traffic in the batched Newton iteration.
    """
    dt = X.dtype
    R = x[None, :] - X                      # (N, d)
    sq = jnp.sum(R * R, axis=1)
    rho = jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)) * (sq > 0.0)
    safe = jnp.where(rho > _EPS, rho, 1.0)
    dpsi = jax.vmap(k.dpsi)(safe)
    d2psi = jax.vmap(k.d2psi)(safe)
    a = jnp.where(rho > _EPS, dpsi / safe, 0.0)
    b = jnp.where(rho > _EPS, (d2psi - a) / safe**2, 0.0)
    iso = jnp.where(rho > _EPS, a, k.d2psi(jnp.zeros((), dt)))
    d = X.shape[1]
    return (jnp.dot(coeff, iso) * jnp.eye(d, dtype=dt)
            + R.T @ (R * (coeff * b)[:, None]))


def kernel_joint_block(k: RBFKernel, r: jax.Array):
    """Joint (f, grad f) prior covariance block  [[k, -gk^T], [gk, -Hk]].

    reference: eval_Dk (radial_basis_functions.jl:152-159).
    """
    kv = kernel_value(k, r)
    gk = kernel_grad(k, r)
    Hk = kernel_hess(k, r)
    top = jnp.concatenate([kv[None], -gk])[None, :]
    bot = jnp.concatenate([gk[:, None], -Hk], axis=1)
    return jnp.concatenate([top, bot], axis=0)


# --------------------------------------------------------------------------
# Batched kernel-matrix assembly (vmap over the reference's loops)
# --------------------------------------------------------------------------

def eval_KXX(k: RBFKernel, X: jax.Array, noise=1e-6):
    """K(X, X) + noise*I for X of shape (N, d).

    reference: eval_KXX (radial_basis_functions.jl:161-178).
    """
    n = X.shape[0]
    diff = X[:, None, :] - X[None, :, :]
    rho = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    K = jax.vmap(jax.vmap(k.psi))(rho)
    # exact psi(0) on the diagonal (avoids sqrt-at-zero noise)
    K = jnp.where(jnp.eye(n, dtype=bool), k.psi(jnp.zeros((), dtype=X.dtype)), K)
    return K + noise * jnp.eye(n, dtype=X.dtype)


def eval_KxX(k: RBFKernel, x: jax.Array, X: jax.Array):
    """k(x, X) of shape (N,) — reference eval_KxX (radial_basis_functions.jl:180-191)."""
    return jax.vmap(lambda xi: kernel_value(k, x - xi))(X)


def eval_grad_KxX(k: RBFKernel, x: jax.Array, X: jax.Array):
    """d/dx k(x, X): shape (N, d) — reference eval_∇KxX (radial_basis_functions.jl:193-208).

    (The reference returns (d, N); we return the transpose, row-major.)
    """
    return jax.vmap(lambda xi: kernel_grad(k, x - xi))(X)


def eval_dKXX(k: RBFKernel, X: jax.Array, dX: jax.Array):
    """Directional derivative of K(X,X) for covariate perturbations dX.

    reference: eval_δKXX (radial_basis_functions.jl:210-228). Diagonal is 0.
    """
    def entry(xi, xj, dxi, dxj):
        return jnp.dot(kernel_grad(k, xi - xj), dxi - dxj)

    M = jax.vmap(lambda xi, dxi: jax.vmap(lambda xj, dxj: entry(xi, xj, dxi, dxj))(X, dX))(X, dX)
    n = X.shape[0]
    return jnp.where(jnp.eye(n, dtype=bool), 0.0, M)


def eval_dKxX(k: RBFKernel, x: jax.Array, X: jax.Array, dX: jax.Array):
    """Directional derivative of k(x, X) under perturbation of X only.

    reference: eval_δKxX (radial_basis_functions.jl:230-245).
    """
    return jax.vmap(lambda xi, dxi: jnp.dot(kernel_grad(k, x - xi), -dxi))(X, dX)


def eval_dgrad_KxX(k: RBFKernel, x: jax.Array, X: jax.Array, dX: jax.Array):
    """Directional derivative of grad_x k(x, X) under perturbation of X: (N, d).

    reference: eval_δ∇KxX (radial_basis_functions.jl:247-262).
    """
    return jax.vmap(lambda xi, dxi: kernel_hess(k, x - xi) @ (-dxi))(X, dX)


def eval_Dtheta_KXX(k: RBFKernel, X: jax.Array, dtheta: jax.Array):
    """Directional derivative of K(X,X) w.r.t. kernel hyperparameters.

    reference: eval_Dθ_KXX (radial_basis_functions.jl:264-284).
    """
    def entry(xi, xj):
        return jnp.dot(k.dtheta_psi(_safe_norm(xi - xj)), dtheta)

    M = jax.vmap(lambda xi: jax.vmap(lambda xj: entry(xi, xj))(X))(X)
    d0 = jnp.dot(k.dtheta_psi(jnp.zeros((), dtype=X.dtype)), dtheta)
    n = X.shape[0]
    return jnp.where(jnp.eye(n, dtype=bool), d0, M)

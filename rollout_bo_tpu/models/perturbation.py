"""Perturbation "surrogates": directional derivatives of the posterior.

API-parity re-design of the reference perturbation surrogates
(`/root/reference/radial_basis_surrogates.jl:633-764`). The reference
hand-derives how posterior quantities (and the acquisition gradient) vary
under a perturbation of one fantasy covariate (SpatialPerturbationSurrogate:
delta-K, delta-c, delta-mu, delta-sigma, delta-grad-alpha; rbs.jl:652-694)
or of one observed *value* through grad-y (DataPerturbationSurrogate;
rbs.jl:711-760).

In the TPU engine these are a `jax.jvp` of {perturbed fantasy point ->
refactorized fantasy posterior -> quantities}: the delta-K/delta-c
back-substitutions fall out of autodiff through the (masked) Cholesky.
They exist (a) for parity with the reference API, (b) as an independent
check of the adjoint machinery, and (c) for the reference's FD test
methodology (runtests.jl:120-157).

Deviation note: the reference DataPerturbationSurrogate omits the direct
K^{-1} delta-y term in delta-c (its delta-y thunk, rbs.jl:734-738,
references an undefined field and is never forced — a latent bug); here
the value perturbation is propagated exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models import fantasy as fant
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.ops import chol as chol_ops
from rollout_bo_tpu.ops import kernels as kern

__all__ = ["PerturbationResult", "refantasize", "spatial_perturbation", "data_perturbation"]


class PerturbationResult(NamedTuple):
    """Directional derivatives of posterior/acquisition quantities."""

    d_mu: jax.Array
    d_sigma: jax.Array
    d_grad_mu: jax.Array
    d_grad_sigma: jax.Array
    d_grad_alpha: jax.Array  # delta(grad alpha): what the adjoint consumes


def refantasize(fs: fant.FantasyState) -> fant.FantasyState:
    """Recompute L and the whole coefficient history from (X, y) — the
    differentiable 'constructor' of a fantasy state.

    Equivalent to replaying fantasy_condition for every recorded fantasy
    point; used so jvp tangents on X/y rows propagate into the factors
    (the reference's delta-K -> delta-c back-substitution, rbs.jl:675).
    """
    n_total = fs.n_base + fs.m
    K = kern.eval_KXX(fs.kernel, fs.X, noise=fs.noise)
    L = chol_ops.masked_cholesky(K, n_total)
    Li = chol_ops.tri_inv_padded(L)
    rows = jnp.arange(fs.capacity)
    eye = jnp.eye(fs.capacity, dtype=fs.L.dtype)

    def coeffs(slot):
        # slot 0 = base (n_base active); slot i>=1 = fantasy i-1 observed
        n_i = fs.n_base + slot
        L_i = jnp.where(rows[:, None] >= n_i, eye, L)
        m_i = (rows < n_i).astype(fs.y.dtype)
        return chol_ops.cho_solve_padded(L_i, fs.y * m_i)

    cs = jax.vmap(coeffs)(jnp.arange(fs.cs.shape[0]))
    return fs._replace(L=L, Li=Li, cs=cs)


def _quantities(st: sg.SurrogateState, rule: DecisionRule, x, theta):
    if getattr(rule, "cost", None) is not None:
        # this mirror of the reference's hand-assembled grad-alpha chain
        # does not carry the CostAwareRule 1/c(x) channel; silently
        # returning unweighted sensitivities would be inconsistent with
        # surrogate.acquisition_grad. The autodiff IFT route
        # (rollout/trajectory.py, via acquisition_value_grad_hess)
        # supports cost-aware rules.
        raise NotImplementedError(
            "perturbation surrogates do not support cost-aware rules; "
            "use the autodiff trajectory gradients instead")
    p = sg.posterior(st, x)
    fmini = sg.get_active_minimum(st)
    args = (p.mu, p.sigma, theta, fmini)
    gmu = rule.dg_dmu(*args)
    gsig = rule.dg_dsigma(*args)
    grad_alpha = gmu * p.grad_mu + gsig * p.grad_sigma
    return p.mu, p.sigma, p.grad_mu, p.grad_sigma, grad_alpha


def spatial_perturbation(
    fs: fant.FantasyState,
    fantasy_index,
    rule: DecisionRule,
    x,
    theta,
    dx,
    sample_index,
) -> PerturbationResult:
    """d(posterior/grad-alpha at x)/d(fantasy covariate `sample_index`) . dx.

    reference: SpatialPerturbationSurrogate eval (rbs.jl:652-694); the
    perturbed row is X[n_base + sample_index] (the reference's
    `observed + sample_index + 1`, rbs.jl:664).
    """
    dt = fs.X.dtype
    row = fs.n_base + jnp.asarray(sample_index, jnp.int32)
    x = jnp.asarray(x, dt)

    def f(xrow):
        X = jnp.where((jnp.arange(fs.capacity) == row)[:, None], xrow[None, :], fs.X)
        fs_ = refantasize(fs._replace(X=X))
        return _quantities(fant.view(fs_, fantasy_index), rule, x, theta)

    xrow0 = jnp.take(fs.X, row, axis=0)
    _, tangents = jax.jvp(f, (xrow0,), (jnp.asarray(dx, dt),))
    return PerturbationResult(*tangents)


def data_perturbation(
    fs: fant.FantasyState,
    fantasy_index,
    rule: DecisionRule,
    x,
    theta,
    dx,
    grad_y,
    sample_index,
) -> PerturbationResult:
    """Perturbation entering through the covariate AND the observed value:
    dy = grad_y . dx (sample-path view of moving fantasy `sample_index`).

    reference: DataPerturbationSurrogate eval (rbs.jl:711-760).
    """
    dt = fs.X.dtype
    row = fs.n_base + jnp.asarray(sample_index, jnp.int32)
    x = jnp.asarray(x, dt)
    grad_y = jnp.asarray(grad_y, dt)

    def f(xrow, yrow):
        sel = jnp.arange(fs.capacity) == row
        X = jnp.where(sel[:, None], xrow[None, :], fs.X)
        y = jnp.where(sel, yrow, fs.y)
        fs_ = refantasize(fs._replace(X=X, y=y))
        return _quantities(fant.view(fs_, fantasy_index), rule, x, theta)

    xrow0 = jnp.take(fs.X, row, axis=0)
    yrow0 = jnp.take(fs.y, row)
    dxj = jnp.asarray(dx, dt)
    _, tangents = jax.jvp(f, (xrow0, yrow0), (dxj, jnp.dot(grad_y, dxj)))
    return PerturbationResult(*tangents)

"""Monte-Carlo / Gauss-Hermite rollout-acquisition estimators.

TPU-native re-design of the reference simulation drivers
(`/root/reference/rollout.jl:279-467`): the reference's serial
per-sample loop {fresh observable -> rollout! -> resolve -> gradient ->
reset!} becomes ONE vmapped, jit-compiled program over the whole
rnstream tensor; gradients come from jax.grad of the per-trajectory
reward (see rollout/trajectory.py) instead of the hand-rolled adjoint.

Statistics use the sample standard deviation (ddof=1) to match Julia's
Distributions.std (rollout.jl:328-339).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models import fantasy as fant
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.ops import quadrature
from rollout_bo_tpu.rollout import observables as obs
from rollout_bo_tpu.rollout.trajectory import (
    ExpectedTrajectoryOutput,
    TrajectoryParams,
    base_fmini,
    rollout_core,
)

__all__ = [
    "simulate_trajectory_mc",
    "simulate_trajectory_ghq",
    "simulate_trajectory_deterministic",
]


def _sample_reward(fs0, x0, theta, lbs, ubs, xstarts, rule, draw_fn, horizon, iterations):
    fmini = base_fmini(fs0)
    _, rec = rollout_core(
        fs0, x0, theta, lbs, ubs, xstarts, rule, draw_fn, horizon,
        iterations=iterations,
    )
    return jnp.maximum(fmini - jnp.min(rec.ys), 0.0)


def _stats(v, axis=0):
    mu = jnp.mean(v, axis=axis)
    n = v.shape[axis]
    if n > 1:
        std = jnp.std(v, axis=axis, ddof=1)
    else:
        std = jnp.zeros_like(mu)
    return mu, std


def simulate_trajectory_mc(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    *,
    with_gradients: bool = True,
    iterations: int = 12,
    draw_mode: str = "reparam",
) -> ExpectedTrajectoryOutput:
    """MC rollout-acquisition estimate at tp.x0 (reference rollout.jl:279-340).

    vmaps over tp.rnstream's mc_iters axis; each lane rolls its own
    fantasy copy (the reference's reset!-and-reuse becomes functional
    per-lane state). draw_mode: "reparam" (exact pathwise gradients,
    default) or "sample_path" (reference coupling); see
    observables.stochastic_observable.
    """
    fs0 = fant.make_fantasy(state, tp.horizon)

    def one(z):
        def reward(x0, theta):
            return _sample_reward(
                fs0, x0, theta, tp.lbs, tp.ubs, xstarts, rule,
                obs.stochastic_observable(z, mode=draw_mode), tp.horizon,
                iterations,
            )

        if with_gradients:
            r, (gx, gth) = jax.value_and_grad(reward, argnums=(0, 1))(tp.x0, tp.theta)
            return r, gx, gth
        r = reward(tp.x0, tp.theta)
        d, p = tp.x0.shape[0], tp.theta.shape[0]
        return r, jnp.zeros((d,), r.dtype), jnp.zeros((p,), r.dtype)

    rs, gxs, gths = jax.vmap(one)(tp.rnstream)
    mu, smu = _stats(rs)
    if not with_gradients:
        return ExpectedTrajectoryOutput(mu=mu, std_mu=smu)
    gx, sgx = _stats(gxs)
    gth, sgth = _stats(gths)
    return ExpectedTrajectoryOutput(
        mu=mu, std_mu=smu, grad_x=gx, std_grad_x=sgx,
        grad_theta=gth, std_grad_theta=sgth,
    )


def simulate_trajectory_ghq(
    state: sg.SurrogateState,
    x0,
    theta,
    lbs,
    ubs,
    xstarts,
    rule: DecisionRule,
    *,
    horizon: int,
    num_nodes: int = 8,
    with_gradients: bool = True,
    iterations: int = 12,
    resolve_mode: str = "quadrature",
    node_scale: float = 1.0,
) -> ExpectedTrajectoryOutput:
    """Gauss-Hermite (SAA / deterministic) rollout estimate.

    reference: simulate_trajectory_ghq (rollout.jl:409-467) with
    tensor-product index sets (utils.jl:217-221).

    resolve_mode:
    - "quadrature": correct tensor-product GH quadrature — each
      trajectory weighted by prod_j w_j / pi^{(h+1)/2} and summed.
    - "reference": the reference's scheme (observables.jl:66-72 +
      mean over samples): only the best step's weight, normalized 1/sqrt(pi),
      then the *mean* over the index set.

    node_scale: multiplies the quadrature nodes — `sqrt(log10(e)) ~ 0.659`
    integrates against the understated fantasy-noise distribution the
    reference's log10 Box-Muller quirk (utils.jl:33-35) draws from in its
    STOCHASTIC runs, for parity comparisons against those archives.
    """
    nodes_np, weights_np = quadrature.gauss_hermite(num_nodes)
    idx = quadrature.tensor_product_indices(num_nodes, horizon + 1)  # (S, h+1)
    dt = state.X.dtype
    nodes = jnp.asarray(nodes_np, dt) * jnp.asarray(node_scale, dt)
    weights = jnp.asarray(weights_np, dt)
    idx = jnp.asarray(idx)
    fs0 = fant.make_fantasy(state, horizon)
    x0 = jnp.asarray(x0, dt)
    theta = jnp.asarray(theta, dt)

    def one(index_tuple):
        nd = nodes[index_tuple]     # (h+1,)
        wt = weights[index_tuple]   # (h+1,)

        def outcome(x0_, theta_):
            fmini = base_fmini(fs0)
            _, rec = rollout_core(
                fs0, x0_, theta_, lbs, ubs, xstarts, rule,
                obs.gauss_hermite_observable(nd), horizon,
                iterations=iterations,
            )
            improvement = jnp.maximum(fmini - jnp.min(rec.ys), 0.0)
            if resolve_mode == "reference":
                b = jnp.argmin(rec.ys)
                r = wt[b] * improvement / jnp.sqrt(jnp.pi)
            else:
                r = improvement
            return r

        if with_gradients:
            r, (gx, gth) = jax.value_and_grad(outcome, argnums=(0, 1))(x0, theta)
            return r, gx, gth
        r = outcome(x0, theta)
        return r, jnp.zeros_like(x0), jnp.zeros_like(theta)

    rs, gxs, gths = jax.vmap(one)(idx)

    if resolve_mode == "reference":
        mu, smu = _stats(rs)
        gx, sgx = _stats(gxs)
        gth, sgth = _stats(gths)
    else:
        W = jnp.prod(weights[idx], axis=1) / jnp.pi ** ((horizon + 1) / 2.0)
        mu = jnp.sum(W * rs)
        smu = jnp.sqrt(jnp.maximum(jnp.sum(W * (rs - mu) ** 2), 0.0))
        gx = jnp.sum(W[:, None] * gxs, axis=0)
        sgx = jnp.sqrt(jnp.maximum(jnp.sum(W[:, None] * (gxs - gx) ** 2, axis=0), 0.0))
        gth = jnp.sum(W[:, None] * gths, axis=0)
        sgth = jnp.sqrt(jnp.maximum(jnp.sum(W[:, None] * (gths - gth) ** 2, axis=0), 0.0))

    if not with_gradients:
        return ExpectedTrajectoryOutput(mu=mu, std_mu=smu)
    return ExpectedTrajectoryOutput(
        mu=mu, std_mu=smu, grad_x=gx, std_grad_x=sgx,
        grad_theta=gth, std_grad_theta=sgth,
    )


def simulate_trajectory_deterministic(
    state: sg.SurrogateState,
    x0,
    theta,
    lbs,
    ubs,
    xstarts,
    rule: DecisionRule,
    f,
    *,
    horizon: int,
    with_gradients: bool = True,
    iterations: int = 12,
) -> ExpectedTrajectoryOutput:
    """Ground-truth-observable rollout (reference DeterministicObservable)."""
    fs0 = fant.make_fantasy(state, horizon)
    dt = state.X.dtype
    x0 = jnp.asarray(x0, dt)
    theta = jnp.asarray(theta, dt)

    def outcome(x0_, theta_):
        return _sample_reward(
            fs0, x0_, theta_, lbs, ubs, xstarts, rule,
            obs.deterministic_observable(f), horizon, iterations,
        )

    if with_gradients:
        r, (gx, gth) = jax.value_and_grad(outcome, argnums=(0, 1))(x0, theta)
        z = jnp.zeros_like
        return ExpectedTrajectoryOutput(r, jnp.zeros_like(r), gx, z(gx), gth, z(gth))
    r = outcome(x0, theta)
    return ExpectedTrajectoryOutput(mu=r, std_mu=jnp.zeros_like(r))

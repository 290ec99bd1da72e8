"""Evaluation-cost models for cost-aware acquisition.

Re-design of `/root/reference/cost_functions.jl`. As in the reference,
cost functions are not wired into the live acquisition path (reference
README.md:21-26 marks cost-aware acquisition aspirational); they are
provided for API parity and for cost-weighted acquisition experiments:
`cost_weighted_rule` divides a base acquisition by the model cost.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "CostFunction",
    "UniformCost",
    "NonUniformCost",
    "UnitCost",
    "GaussianProcessCost",
    "cost_weighted_rule",
]


@dataclasses.dataclass(frozen=True)
class CostFunction:
    """c(x) with gradient/Hessian via jax (reference cost_functions.jl:5-40)."""

    f: Callable[[jax.Array], jax.Array]
    uniform: bool = False

    def __call__(self, x):
        return self.f(jnp.asarray(x))

    def grad(self, x):
        x = jnp.asarray(x)
        if self.uniform:
            return jnp.zeros_like(x)
        return jax.grad(self.f)(x)

    def hess(self, x):
        x = jnp.asarray(x)
        d = x.shape[0]
        if self.uniform:
            return jnp.zeros((d, d), x.dtype)
        return jax.hessian(self.f)(x)


def NonUniformCost(f: Callable) -> CostFunction:
    return CostFunction(f=f, uniform=False)


def UniformCost(n: float = 1.0) -> CostFunction:
    return CostFunction(f=lambda x: jnp.asarray(n, dtype=x.dtype), uniform=True)


def UnitCost() -> CostFunction:
    return UniformCost(1.0)


def GaussianProcessCost(state) -> CostFunction:
    """Learned cost model: the posterior mean of a GP fit to observed costs.

    The reference declares this as an empty struct (cost_functions.jl:46-47,
    never implemented); here it is functional: fit a surrogate to
    (locations, measured costs) and use its posterior mean, clamped to a
    small positive floor so cost-weighted acquisitions stay finite.
    """
    from rollout_bo_tpu.models import surrogate as sg

    def f(x):
        p = sg.posterior(state, x)
        return jnp.maximum(p.mu, 1e-6)

    return CostFunction(f=f, uniform=False)


def cost_weighted_rule(rule, cost: CostFunction):
    """Cost-aware acquisition: alpha(x) / c(x) (EI-per-unit-cost form).

    The reference lists cost-aware acquisition as aspirational
    (README.md:21-26); this composes any DecisionRule evaluation with a
    cost model at the solver level. Returns a function
    (state, x, theta) -> weighted acquisition value suitable for custom
    solve loops.
    """
    from rollout_bo_tpu.models import surrogate as sg

    def alpha_per_cost(state, x, theta):
        a = sg.acquisition(state, rule, x, theta)
        return a / jnp.maximum(cost(x), 1e-12)

    return alpha_per_cost

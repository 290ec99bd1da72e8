"""Evaluation-cost models for cost-aware acquisition.

Re-design of `/root/reference/cost_functions.jl`. The reference never
wires costs into its live acquisition path (README.md:21-26 marks
cost-aware acquisition aspirational); here they are fully functional:
`CostAwareRule` weights any decision rule by 1/c(x) and plugs into
every solver and the rollout engine (the inner multistart Newton solve,
the fantasy trajectories, and the outer SGA all accept it unchanged —
the x-dependent cost corrections are applied inside
models/surrogate.py's acquisition value/grad/Hessian).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models.decision_rules import DecisionRule

__all__ = [
    "CostFunction",
    "UniformCost",
    "NonUniformCost",
    "UnitCost",
    "GaussianProcessCost",
    "CostAwareRule",
    "cost_aware",
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


@dataclasses.dataclass(frozen=True)
class CostAwareRule(DecisionRule):
    """A decision rule maximized per unit evaluation cost: alpha(x)/c(x).

    Keeps the base rule's `name` (so Random dispatch and MLE gating keep
    working) and its (mu, sigma, theta) partials; the x-dependent 1/c(x)
    weighting — value, gradient, and Hessian quotient-rule corrections —
    is applied by models/surrogate.py::acquisition{,_grad,
    _value_grad_hess}, which every solver (XLA Newton, IFT adjoint,
    outer SGA) consumes. The Pallas hot kernel does not implement the
    cost channel, so rollout/solvers.py routes cost-aware rules to the
    XLA path.
    """

    cost: CostFunction | None = None


def cost_aware(rule: DecisionRule, cost: CostFunction) -> CostAwareRule:
    """Wrap a rule so every solver maximizes alpha(x) / c(x)."""
    return CostAwareRule(name=rule.name, sigma_tol=rule.sigma_tol, cost=cost)


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

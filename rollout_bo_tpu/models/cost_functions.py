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
    """A decision rule maximized per unit evaluation cost.

    Nonnegative rules (EI, POI) maximize alpha(x)/c(x); the log-scale
    rule (LogEI) maximizes log alpha - log c — dividing a NEGATIVE log
    value by the cost would invert the preference (expensive regions
    would look better). Rules whose scale is signed and non-log (LCB)
    have no well-defined per-unit-cost form and are rejected by
    `cost_aware`.

    Keeps the base rule's `name` (so Random dispatch and MLE gating keep
    working) and its (mu, sigma, theta) partials; the x-dependent cost
    corrections — value, gradient, and Hessian — are applied by
    models/surrogate.py::acquisition{,_grad,_value_grad_hess}, which
    every solver (XLA Newton, IFT adjoint, outer SGA) consumes. The
    Pallas hot kernel does not implement the cost channel, so
    rollout/solvers.py routes cost-aware rules to the XLA path.
    """

    cost: CostFunction | None = None


_COST_COMPOSABLE = {"EI": "divide", "POI": "divide", "Random": "divide",
                    "LogEI": "subtract_log", "LogPOI": "subtract_log"}


def cost_aware(rule: DecisionRule, cost: CostFunction) -> CostAwareRule:
    """Wrap a rule so every solver maximizes it per unit evaluation cost."""
    if getattr(rule, "cost", None) is not None:
        raise ValueError("rule is already cost-aware; composing two cost "
                         "weightings would divide by the cost twice")
    if rule.name not in _COST_COMPOSABLE:
        raise ValueError(
            f"cost-aware form of rule {rule.name!r} is undefined (signed, "
            "non-log scale); supported: " + ", ".join(sorted(_COST_COMPOSABLE)))
    return CostAwareRule(name=rule.name, sigma_tol=rule.sigma_tol, cost=cost)


def cost_weighted_rule(rule, cost: CostFunction):
    """Cost-aware acquisition value function (legacy functional form).

    Thin wrapper over `cost_aware` (single source of truth for the cost
    composition and its floor): returns a function
    (state, x, theta) -> per-unit-cost acquisition value suitable for
    custom solve loops. Prefer `cost_aware(rule, cost)` directly — the
    resulting rule plugs into every solver with exact grad/Hessian.
    """
    from rollout_bo_tpu.models import surrogate as sg

    caw = cost_aware(rule, cost)

    def alpha_per_cost(state, x, theta):
        return sg.acquisition(state, caw, x, theta)

    return alpha_per_cost

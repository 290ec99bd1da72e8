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

__all__ = ["CostFunction", "UniformCost", "NonUniformCost", "UnitCost"]


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

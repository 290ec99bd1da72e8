"""Myopic Bayesian-optimization loop (EI/POI/LCB/Random baselines).

TPU-native re-design of the reference myopic driver loop
(`/root/reference/experiments/myopic_bayesopt.jl:207-263`): the whole BO
iteration — 60+ multistart Newton solves, the true-function evaluation,
the rank-1 surrogate update and the hyperparameter MLE — is ONE jitted
program with static shapes, compiled once and reused for every budget
step and trial.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.models.testfns import TestFunction
from rollout_bo_tpu.ops import kernels as kern
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout import solvers
from rollout_bo_tpu.utils import metrics

__all__ = ["MyopicBOResult", "run_myopic_bo"]


@dataclass
class MyopicBOResult:
    X: np.ndarray                # (n_init + budget, d) all sampled points
    y: np.ndarray                # (n_init + budget,)
    gaps: np.ndarray             # (budget,) gap before each new sample
    simple_regrets: np.ndarray   # (budget,)
    minimum_observations: np.ndarray  # (budget,)
    times: np.ndarray            # (budget,) acquisition-solve wall seconds
    state: sg.SurrogateState = field(repr=False, default=None)


def run_myopic_bo(
    testfn: TestFunction,
    rule: DecisionRule,
    *,
    budget: int = 100,
    theta=(0.0,),
    n_init: int = 5,
    num_starts: int = 64,
    seed: int = 1906,
    kernel: kern.RBFKernel | None = None,
    kernel_lbs=(0.1,),
    kernel_ubs=(5.0,),
    noise: float = 1e-6,
    mle_every: int = 1,
    solver_iterations: int = 12,
    dtype=None,
    x_init: np.ndarray | None = None,
) -> MyopicBOResult:
    """One myopic BO trial (protocol of myopic_bayesopt.jl:94-263).

    5 uniform initial samples, Matern52 + per-iteration MLE in [0.1, 5],
    `num_starts` Sobol multistarts + 2 near-boundary points per solve.
    """
    kernel = kernel or kern.matern52()
    lbs, ubs = testfn.lbs, testfn.ubs
    d = testfn.dim
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    if x_init is None:
        x_init = qmc.randsample(n_init, d, lbs, ubs, rng)
    y_init = np.asarray(testfn.batch(x_init))

    capacity = n_init + budget
    state = sg.fit(kernel, x_init, y_init, capacity=capacity, noise=noise, dtype=dtype)
    dt = state.X.dtype
    xstarts = jnp.asarray(qmc.generate_initial_guesses(num_starts, lbs, ubs), dt)
    theta = jnp.asarray(theta, dt)
    klbs = jnp.asarray(kernel_lbs, dt)
    kubs = jnp.asarray(kernel_ubs, dt)

    @jax.jit
    def solve_step(state: sg.SurrogateState, key):
        res = solvers.multistart_maximize(
            state, rule, theta, lbs, ubs, xstarts,
            iterations=solver_iterations, key=key,
        )
        return res.x

    @jax.jit
    def observe_step(state: sg.SurrogateState, xnext):
        ynext = testfn.f(xnext)
        return sg.condition(state, xnext, ynext), ynext

    @jax.jit
    def mle_step(state: sg.SurrogateState):
        return sg.optimize_hypers(state, klbs, kubs)

    true_minimum = testfn.fmin
    initial_best = float(y_init.min())

    gaps = np.zeros(budget)
    regrets = np.zeros(budget)
    min_obs = np.zeros(budget)
    times = np.zeros(budget)
    X_all = [np.asarray(x) for x in x_init]
    y_all = list(map(float, y_init))

    for b in range(budget):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        xnext = solve_step(state, sub)
        xnext.block_until_ready()
        times[b] = time.perf_counter() - t0

        best = min(y_all)
        gaps[b] = metrics.gap(initial_best, best, true_minimum)
        regrets[b] = metrics.simple_regret(true_minimum, best)

        state, ynext = observe_step(state, xnext)
        if (b + 1) % mle_every == 0 and rule.name != "Random":
            state = mle_step(state)
        X_all.append(np.asarray(xnext))
        y_all.append(float(ynext))
        min_obs[b] = min(y_all)

    return MyopicBOResult(
        X=np.stack(X_all),
        y=np.asarray(y_all),
        gaps=gaps,
        simple_regrets=regrets,
        minimum_observations=min_obs,
        times=times,
        state=state,
    )

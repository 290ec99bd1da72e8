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
from rollout_bo_tpu.models.decision_rules import EI, DecisionRule
from rollout_bo_tpu.models.testfns import TestFunction
from rollout_bo_tpu.ops import kernels as kern
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout import solvers
from rollout_bo_tpu.utils import metrics

__all__ = [
    "MyopicBOResult",
    "run_myopic_bo",
    "run_nonmyopic_bo",
    "run_adaptive_bo",
    "alternating_horizon",
    "fixed_horizon",
    "truncated_horizon",
]


from collections import OrderedDict

_PROGRAM_CACHE: OrderedDict = OrderedDict()
_PROGRAM_CACHE_MAX = 64  # LRU bound: entries pin compiled executables and
# the objects their closures capture (testfns, device buffers)


def _cached_program(key, builder):
    """Reuse jitted programs across BO-runner calls (e.g. CLI trials).

    A fresh `@jax.jit` closure per runner call retraces and RECOMPILES
    identical HLO every trial; the remote-compile path (axon tunnel)
    cannot reload executables from the persistent compile cache, so each
    trial of a CLI sweep paid the full compile (~46 s at the myopic
    suite scale, measured in the per-iteration times CSV). The key must
    cover everything the traced closure captures: rule, bounds, shapes,
    dtype, kernel kind, and solver hyperparameters. LRU-bounded so a
    long-lived process sweeping many configs cannot accumulate compiled
    programs (and their captured device buffers) without limit.
    """
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = builder()
        _PROGRAM_CACHE[key] = fn
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)
    else:
        _PROGRAM_CACHE.move_to_end(key)
    return fn


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
    checkpoint_path: str | None = None,
    checkpoint_every: int = 10,
    steps_per_call: int = 0,
) -> MyopicBOResult:
    """One myopic BO trial (protocol of myopic_bayesopt.jl:94-263).

    5 uniform initial samples, Matern52 + per-iteration MLE in [0.1, 5],
    `num_starts` Sobol multistarts + 2 near-boundary points per solve.

    `steps_per_call` BO iterations are fused into one device program
    (`lax.scan` over full solve->observe->condition->MLE steps); 0 = auto
    (whole budget, or the checkpoint cadence when checkpointing), 1 =
    one dispatch per iteration.

    If `checkpoint_path` is given, the surrogate + metric arrays are
    snapshotted every `checkpoint_every` iterations and a crashed trial
    resumes from the last snapshot (the reference cannot resume a trial —
    SURVEY §5.4).
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

    _shape_key = (capacity, d, str(dt), kernel.kind,
                  tuple(np.asarray(lbs).tolist()), tuple(np.asarray(ubs).tolist()))

    not_random = rule.name != "Random"

    def _build_chunk(k):
        @jax.jit
        def trial_chunk(state: sg.SurrogateState, key, best, b0):
            """k fused BO iterations as ONE device program.

            Each scan step is a full BO iteration: multistart acquisition
            solve -> true-function evaluation -> rank-1 condition ->
            (masked) hyperparameter MLE -> running-minimum update. The
            MLE refit runs unconditionally and is selected by a traced
            mask (lax.cond would recompile per branch combination); at
            these sizes the refit is microseconds of device time while a
            separate dispatch costs a host<->device round-trip. Fusing k
            iterations per dispatch amortizes the per-dispatch tunnel
            overhead that dominated the tiny myopic programs (measured
            ~70 ms/iter at 2 dispatches/iter on the tunneled v5e vs the
            reference's 15-25 ms; fused: see PERF.md).
            """
            def body(carry, i):
                state, key, best = carry
                key, sub = jax.random.split(key)
                res = solvers.multistart_maximize(
                    state, rule, theta, lbs, ubs, xstarts,
                    iterations=solver_iterations, key=sub,
                )
                xnext = res.x
                ynext = testfn.f(xnext)
                st = sg.condition(state, xnext, ynext)
                it = b0 + i + 1
                do_mle = jnp.logical_and(it % mle_every == 0, not_random)
                st_mle = sg.optimize_hypers(st, klbs, kubs)
                state = jax.tree.map(
                    lambda a, b: jnp.where(do_mle, b, a), st, st_mle)
                gap_basis = best  # incumbent BEFORE this observation
                best = jnp.minimum(best, ynext)
                return (state, key, best), (xnext, ynext, gap_basis, best)

            (state, key, best), outs = jax.lax.scan(
                body, (state, key, best), jnp.arange(k, dtype=jnp.int32))
            return state, key, best, outs

        return trial_chunk

    true_minimum = testfn.fmin
    initial_best = float(y_init.min())

    gaps = np.zeros(budget)
    regrets = np.zeros(budget)
    min_obs = np.zeros(budget)
    times = np.zeros(budget)
    X_all = [np.asarray(x) for x in x_init]
    y_all = list(map(float, y_init))
    start_b = 0

    if checkpoint_path is not None:
        import os

        from rollout_bo_tpu.utils import checkpoint as ckpt

        if os.path.exists(checkpoint_path if checkpoint_path.endswith(".npz")
                          else checkpoint_path + ".npz"):
            state, start_b, saved = ckpt.load_bo_checkpoint(
                checkpoint_path, capacity=capacity)
            gaps[:start_b] = saved["gaps"][:start_b]
            regrets[:start_b] = saved["simple_regrets"][:start_b]
            min_obs[:start_b] = saved["minimum_observations"][:start_b]
            times[:start_b] = saved["times"][:start_b]
            X_all = [np.asarray(x) for x in saved["X_all"]]
            y_all = list(map(float, saved["y_all"]))
            for _ in range(start_b):
                key, _ = jax.random.split(key)

    # Chunk size: fuse k BO iterations per device dispatch. Default is the
    # whole remaining budget (one program per trial); with checkpointing,
    # chunks align to the snapshot cadence so every checkpoint reflects a
    # chunk boundary.
    if steps_per_call <= 0:
        k_default = checkpoint_every if checkpoint_path is not None else budget
    else:
        k_default = steps_per_call
    k_default = max(1, min(k_default, budget))

    best = jnp.asarray(min(y_all), dt)
    b = start_b
    while b < budget:
        k = min(k_default, budget - b)
        chunk = _cached_program(
            ("myopic_chunk", k, rule, tuple(np.asarray(theta).tolist()),
             num_starts, solver_iterations, mle_every, id(testfn),
             tuple(np.asarray(kernel_lbs).tolist()),
             tuple(np.asarray(kernel_ubs).tolist()), _shape_key),
            lambda k=k: _build_chunk(k))
        t0 = time.perf_counter()
        state, key, best, (xs, ys, gap_basis, mins) = chunk(
            state, key, best, jnp.asarray(b, jnp.int32))
        jax.block_until_ready(mins)
        elapsed = time.perf_counter() - t0

        gb = np.asarray(gap_basis)
        gaps[b:b + k] = [metrics.gap(initial_best, float(v), true_minimum)
                         for v in gb]
        regrets[b:b + k] = [metrics.simple_regret(true_minimum, float(v))
                            for v in gb]
        min_obs[b:b + k] = np.asarray(mins)
        # per-iteration wall time is uniform within a fused chunk (the
        # reference times the acquisition solve alone; a fused chunk also
        # contains the observe+condition+MLE, a few percent of the step)
        times[b:b + k] = elapsed / k
        X_all.extend(np.asarray(xs))
        y_all.extend(map(float, np.asarray(ys)))
        b += k

        if checkpoint_path is not None and b % checkpoint_every == 0:
            from rollout_bo_tpu.utils import checkpoint as ckpt

            ckpt.save_bo_checkpoint(
                checkpoint_path, state, iteration=b,
                metrics=dict(gaps=gaps, simple_regrets=regrets,
                             minimum_observations=min_obs, times=times,
                             X_all=np.stack(X_all), y_all=np.asarray(y_all)),
            )

    return MyopicBOResult(
        X=np.stack(X_all),
        y=np.asarray(y_all),
        gaps=gaps,
        simple_regrets=regrets,
        minimum_observations=min_obs,
        times=times,
        state=state,
    )


def _make_exploration_fallback(rule, theta, lbs_j, ubs_j, xstarts,
                               solver_iterations):
    """Escape hatch for a flat-zero rollout acquisition.

    When every outer restart reports zero expected improvement, the MC
    rollout estimate offers no direction (no trajectory sample crossed the
    incumbent: the empirical mean AND its gradient are exactly zero, so
    Adam freezes and the restart-winner argmax degenerates to a tie). The
    reference has no guard here — its BO loop re-samples the first batch
    point, the duplicate row makes the rank-1 Cholesky update singular,
    and the whole trial dies to `<fn>_failed.txt`
    (adaptive_bayesopt.jl:492-542). Instead: fall back to the ANALYTIC
    myopic acquisition (nonzero and differentiable far beyond the MC
    estimate's sample support), and if even that is flat, to the
    max-posterior-σ candidate (pure exploration) — both of which move to
    a new point, keeping the surrogate update well-posed.
    """

    # LogEI never flattens: where EI underflows to an exact zero surface
    # (the precise scenario this fallback exists for), log EI still has a
    # finite value and gradient for the solver to follow — so the analytic
    # fallback solve uses the log form regardless of the rollout's base
    # rule (same argmax as EI; test_logei_matches_log_of_ei_and_is_stable)
    from rollout_bo_tpu.models.decision_rules import LogEI

    log_rule = LogEI() if rule.name in ("EI", "LogEI", "Random") else rule

    @jax.jit
    def fallback(state: sg.SurrogateState):
        res = solvers.multistart_maximize(
            state, log_rule, theta, lbs_j, ubs_j, xstarts,
            iterations=solver_iterations,
        )
        sig = jax.vmap(lambda xx: sg.posterior(state, xx).sigma)(xstarts)
        x_explore = xstarts[jnp.argmax(sig)]
        # LogEI is finite everywhere, so finiteness alone cannot gate the
        # escape; also require the solve to land a genuinely NEW point —
        # conditioning on a (near-)duplicate row is the ill-conditioned
        # rank-1 update this fallback exists to prevent
        scale = jnp.max(ubs_j - lbs_j)
        d2 = jnp.sum((state.X - res.x[None, :]) ** 2, axis=1)
        big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
        dmin = jnp.sqrt(jnp.min(jnp.where(state.mask, d2, big)))
        ok = jnp.isfinite(res.value) & (dmin > 1e-6 * scale)
        if log_rule.name == "LogEI":
            # On functions whose minimum sits far BELOW the zero prior
            # mean (fmini - mu_prior < 0 everywhere), LogEI's far field is
            # the huge-negative -z^2/2 tail and its global argmax glues to
            # the incumbent: the solve returns an epsilon-step point whose
            # actual EI is transfinitely small, and the BO loop crawls,
            # re-observing the same basin for the whole budget (measured
            # on styblinskitang10d h=0: gap 0.389 vs the reference's
            # 0.683 — the reference's flat-surface trials either explore
            # by multistart tie-break or die to _failed.txt). Gate on the
            # EI actually being meaningful at the function's own scale;
            # otherwise take the max-posterior-sigma explorer, which IS
            # sequential space-filling.
            fmini = sg.get_active_minimum(state)
            floor = jnp.log(1e-4 * jnp.maximum(1.0, jnp.abs(fmini)))
            ok = ok & (res.value > floor)
        return jnp.where(ok, res.x, x_explore), res.value

    return fallback


def run_nonmyopic_bo(
    testfn: TestFunction,
    *,
    horizon: int = 1,
    mc_iters: int = 25,
    budget: int = 15,
    theta=(0.0,),
    n_init: int = 5,
    num_starts: int = 16,
    num_restarts: int = 4,
    sgd_iters: int = 25,
    lr: float = 0.01,
    seed: int = 1906,
    kernel: kern.RBFKernel | None = None,
    kernel_lbs=(0.1,),
    kernel_ubs=(5.0,),
    noise: float = 1e-6,
    mle_every: int = 1,
    solver_iterations: int = 12,
    use_low_discrepancy: bool = True,
    log10_parity: bool = False,
    rule: DecisionRule | None = None,
    draw_mode: str = "reparam",
    dtype=None,
    x_init: np.ndarray | None = None,
    mesh=None,
    deterministic: bool = False,
    ghq_nodes: int = 8,
    outer_solver: str = "fused",
    steps_per_call: int = 10,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 5,
) -> MyopicBOResult:
    """Non-myopic (rollout-EI) BO trial.

    The intended full loop of the reference nonmyopic/adaptive drivers
    (nonmyopic_bayesopt.jl CLI flags; adaptive_bayesopt.jl:479-526): per
    BO iteration, SGA-ascend the h-step rollout acquisition from a batch
    of candidate starts (each ascent iteration = mc_iters fantasized
    trajectories with adjoint gradients under fixed QMC streams), take the
    best restart, evaluate the true function there, rank-1-condition the
    surrogate, and re-optimize kernel hyperparameters.

    If `mesh` is given, restarts are sharded across its 'restarts' axis.
    `deterministic=True` selects the SAA/Gauss-Hermite (variance-free)
    solver — the reference's `--deterministic-solve` flag
    (nonmyopic_bayesopt.jl:63-66, utils.jl:267-306).

    `outer_solver`: "fused" (the bench production path — the whole
    multi-restart SGA solve as ONE device program with a while_loop and
    device-side exact all-stopped early exit,
    `outer.make_fused_sga_program`), "scanned"
    (`stochastic_solve_scanned`: `steps_per_call` SGA iterations fused per
    dispatch, host-side early exit between windows), or "batch" (vmapped
    lax.while_loop per restart via `stochastic_solve_batch`).
    """
    from rollout_bo_tpu.rollout import outer as outer_mod
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    rule = rule or EI()
    kernel = kernel or kern.matern52()
    lbs, ubs = testfn.lbs, testfn.ubs
    d = testfn.dim
    rng = np.random.default_rng(seed)

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
    lbs_j = jnp.asarray(lbs, dt)
    ubs_j = jnp.asarray(ubs, dt)

    def make_rnstream():
        if use_low_discrepancy:
            # log10_parity reproduces the reference's Box-Muller `log10`
            # quirk (utils.jl:33-35): its archived variance-reduction runs
            # fantasize with draws of std log10(e)^0.5 ~ 0.659, not N(0,1).
            # Matching that understated fantasy noise is required for regret
            # parity against those archives (small-d functions especially).
            z = qmc.gen_low_discrepancy_sequence(
                mc_iters, d, horizon + 1, log10_parity=log10_parity)
        else:
            z = rng.normal(size=(mc_iters, d + 1, horizon + 1))
        return jnp.asarray(z, dt)

    # rnstream placeholder: the programs always substitute their rnstream
    # argument (tp._replace), only the shape is traced
    tp0 = TrajectoryParams(
        x0=jnp.zeros((d,), dt), theta=theta, lbs=lbs_j, ubs=ubs_j,
        rnstream=jnp.zeros((mc_iters, d + 1, horizon + 1), dt),
    )
    _shape_key = (capacity, d, str(dt), kernel.kind,
                  tuple(np.asarray(lbs).tolist()), tuple(np.asarray(ubs).tolist()))
    _acq_key = ("nm_acquire", rule, tuple(np.asarray(theta).tolist()),
                horizon, mc_iters, num_starts, num_restarts, sgd_iters, lr,
                solver_iterations, draw_mode, deterministic, ghq_nodes,
                log10_parity, outer_solver, steps_per_call, _shape_key)

    def _build_acquire():
        if deterministic:
            @jax.jit
            def acquire(state: sg.SurrogateState, rnstream, restarts):
                xs, vals = outer_mod.deterministic_solve_batch(
                    state, theta, lbs_j, ubs_j, xstarts, restarts, rule,
                    horizon=horizon, num_nodes=ghq_nodes, max_iters=sgd_iters,
                    lr=lr, inner_iterations=solver_iterations,
                    node_scale=_ghq_node_scale(log10_parity),
                )
                j = jnp.argmax(vals)
                return xs[j], vals[j]

            return acquire
        if outer_solver == "fused":
            program = outer_mod.make_fused_sga_program(
                state, tp0, rule, xstarts, max_iters=sgd_iters,
                lr=lr, inner_iterations=solver_iterations,
                draw_mode=draw_mode, select_best=True,
            )

            def acquire(state: sg.SurrogateState, rnstream, restarts):
                return program(state, rnstream, restarts)

            return acquire
        if outer_solver == "scanned":
            program = outer_mod.make_scanned_sga_program(
                state, tp0, rule, xstarts, steps_per_call=steps_per_call,
                lr=lr, inner_iterations=solver_iterations, draw_mode=draw_mode,
            )

            def acquire(state: sg.SurrogateState, rnstream, restarts):
                xs, vals = outer_mod.stochastic_solve_scanned(
                    state, tp0._replace(rnstream=rnstream), rule, xstarts,
                    restarts, max_iters=sgd_iters, lr=lr,
                    inner_iterations=solver_iterations, draw_mode=draw_mode,
                    program=program,
                )
                j = int(jnp.argmax(vals))
                return xs[j], vals[j]

            return acquire

        @jax.jit
        def acquire(state: sg.SurrogateState, rnstream, restarts):
            xs, vals = outer_mod.stochastic_solve_batch(
                state, tp0._replace(rnstream=rnstream), rule, xstarts,
                restarts, max_iters=sgd_iters, lr=lr,
                inner_iterations=solver_iterations, draw_mode=draw_mode,
            )
            j = jnp.argmax(vals)
            return xs[j], vals[j]

        return acquire

    def _build_observe():
        @jax.jit
        def observe(state: sg.SurrogateState, xnext, do_mle):
            # observe + condition + masked MLE in one dispatch (see the
            # myopic loop's observe_step for the rationale)
            ynext = testfn.f(xnext)
            st = sg.condition(state, xnext, ynext)
            st_mle = sg.optimize_hypers(st, klbs, kubs)
            st = jax.tree.map(lambda a, bb: jnp.where(do_mle, bb, a), st, st_mle)
            return st, ynext

        return observe

    acquire = _cached_program(_acq_key, _build_acquire)
    observe = _cached_program(
        ("nm_observe", id(testfn), tuple(np.asarray(kernel_lbs).tolist()),
         tuple(np.asarray(kernel_ubs).tolist()), _shape_key), _build_observe)
    fallback = _cached_program(
        ("nm_fallback", rule, tuple(np.asarray(theta).tolist()),
         num_starts, solver_iterations, _shape_key),
        lambda: _make_exploration_fallback(
            rule, theta, lbs_j, ubs_j, xstarts, solver_iterations))

    true_minimum = testfn.fmin
    initial_best = float(y_init.min())

    gaps = np.zeros(budget)
    regrets = np.zeros(budget)
    min_obs = np.zeros(budget)
    times = np.zeros(budget)
    X_all = [np.asarray(x) for x in x_init]
    y_all = list(map(float, y_init))
    start_b = 0

    if checkpoint_path is not None:
        import os

        from rollout_bo_tpu.utils import checkpoint as ckpt

        if os.path.exists(checkpoint_path if checkpoint_path.endswith(".npz")
                          else checkpoint_path + ".npz"):
            state, start_b, saved = ckpt.load_bo_checkpoint(
                checkpoint_path, capacity=capacity)
            gaps[:start_b] = saved["gaps"][:start_b]
            regrets[:start_b] = saved["simple_regrets"][:start_b]
            min_obs[:start_b] = saved["minimum_observations"][:start_b]
            times[:start_b] = saved["times"][:start_b]
            X_all = [np.asarray(x) for x in saved["X_all"]]
            y_all = list(map(float, saved["y_all"]))
            if not use_low_discrepancy:
                # replay the per-iteration normal draws consumed so far so
                # the resumed stream continues where the crash left off
                # (the QMC stream is stateless and needs no replay)
                for _ in range(start_b):
                    make_rnstream()

    for b in range(start_b, budget):
        # full reference batch: num_restarts Sobol points + the two
        # eps-interior near-boundary points (utils.jl:97-106); truncated
        # to num_restarts only when a mesh requires divisibility
        batch = qmc.generate_batch(num_restarts, lbs, ubs)
        restarts = jnp.asarray(batch[:num_restarts] if mesh is not None else batch, dt)
        rnstream = make_rnstream()
        if mesh is not None:
            from rollout_bo_tpu.parallel import mesh as mesh_mod
            restarts = mesh_mod.shard_leading(restarts, mesh, "restarts")
        t0 = time.perf_counter()
        xnext, vbest = acquire(state, rnstream, restarts)
        vb = float(vbest)
        if not np.isfinite(vb) or vb <= 0.0:
            xnext, _ = fallback(state)
        xnext.block_until_ready()
        times[b] = time.perf_counter() - t0

        best = min(y_all)
        gaps[b] = metrics.gap(initial_best, best, true_minimum)
        regrets[b] = metrics.simple_regret(true_minimum, best)

        state, ynext = observe(
            state, xnext, jnp.asarray((b + 1) % mle_every == 0))
        X_all.append(np.asarray(xnext))
        y_all.append(float(ynext))
        min_obs[b] = min(y_all)

        if checkpoint_path is not None and (b + 1) % checkpoint_every == 0:
            from rollout_bo_tpu.utils import checkpoint as ckpt

            ckpt.save_bo_checkpoint(
                checkpoint_path, state, iteration=b + 1,
                metrics=dict(gaps=gaps, simple_regrets=regrets,
                             minimum_observations=min_obs, times=times,
                             X_all=np.stack(X_all), y_all=np.asarray(y_all)),
            )

    return MyopicBOResult(
        X=np.stack(X_all),
        y=np.asarray(y_all),
        gaps=gaps,
        simple_regrets=regrets,
        minimum_observations=min_obs,
        times=times,
        state=state,
    )


def alternating_horizon(max_horizon: int = 1):
    """Reference adaptive schedule: h alternates 0, max_h, 0, max_h, ...

    adaptive_bayesopt.jl:505 (`tp.h = budget % 2 == 1 ? 0 : 1`), with the
    reference's hard-coded 1 generalized to max_horizon. `b` is 0-based.
    """

    def schedule(b: int, budget: int) -> int:
        return 0 if (b + 1) % 2 == 1 else max_horizon

    return schedule


def _ghq_node_scale(log10_parity: bool) -> float:
    """GHQ node multiplier under log10 parity: sqrt(log10(e)) ~ 0.659
    integrates against the understated fantasy-noise distribution the
    reference's Box-Muller log10 quirk (utils.jl:33-35) actually draws
    from, so deterministic-solve runs are comparable with its stochastic
    archives."""
    return float(np.sqrt(np.log10(np.e))) if log10_parity else 1.0


def fixed_horizon(max_horizon: int):
    """Constant-horizon schedule — the reference's no-truncated-horizons
    archive (metadata `Should Truncate Horizon: false`, fixed h each
    iteration)."""

    def schedule(b: int, budget: int) -> int:
        return max_horizon

    return schedule


def truncated_horizon(max_horizon: int):
    """The reference's commented-out alternative (adaptive_bayesopt.jl:503):
    truncate the horizon as the remaining budget shrinks."""

    def schedule(b: int, budget: int) -> int:
        return min(max_horizon, budget - (b + 1))

    return schedule


def _device_peak_bytes():
    """Best-effort device memory telemetry (reference logs @timed bytes;
    adaptive_bayesopt.jl:508-520). Returns peak bytes in use, or 0 when the
    backend exposes no memory stats (e.g. CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)))
    except Exception:
        return 0


def run_adaptive_bo(
    testfn: TestFunction,
    *,
    horizon: int = 1,
    schedule: Callable[[int, int], int] | None = None,
    mc_iters: int = 25,
    budget: int = 15,
    theta=(0.0,),
    n_init: int = 1,
    num_starts: int = 16,
    num_restarts: int = 4,
    sgd_iters: int = 25,
    lr: float = 0.01,
    seed: int = 1906,
    kernel: kern.RBFKernel | None = None,
    kernel_lbs=(0.1,),
    kernel_ubs=(5.0,),
    noise: float = 1e-6,
    mle_every: int = 10**9,
    solver_iterations: int = 12,
    use_low_discrepancy: bool = True,
    log10_parity: bool = False,
    deterministic: bool = False,
    ghq_nodes: int = 8,
    rule: DecisionRule | None = None,
    draw_mode: str = "reparam",
    dtype=None,
    x_init: np.ndarray | None = None,
):
    """Adaptive-horizon rollout BO trial (reference adaptive_bayesopt.jl:479-526).

    Each BO iteration solves the rollout acquisition at horizon
    schedule(b, budget) (default: the reference's alternating 0/h), over a
    batch of `num_restarts` outer starts; `deterministic=True` selects the
    SAA/Gauss-Hermite solver (reference `rollout_solver_saa`), otherwise the
    stochastic (MC + QMC streams) solver. One jitted program is compiled
    per distinct horizon and reused across iterations and trials.

    Returns a MyopicBOResult whose `times` carry the acquisition-solve wall
    seconds and an extra `allocations` array (device peak bytes per
    iteration, the reference's @timed bytes analog) attached as an
    attribute.
    """
    from rollout_bo_tpu.rollout import outer as outer_mod
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    rule = rule or EI()
    kernel = kernel or kern.matern52()
    schedule = schedule or alternating_horizon(horizon)
    lbs, ubs = testfn.lbs, testfn.ubs
    d = testfn.dim
    rng = np.random.default_rng(seed)

    if x_init is None:
        x_init = qmc.randsample(n_init, d, lbs, ubs, rng)
    y_init = np.asarray(testfn.batch(x_init))

    capacity = x_init.shape[0] + budget
    state = sg.fit(kernel, x_init, y_init, capacity=capacity, noise=noise, dtype=dtype)
    dt = state.X.dtype
    xstarts = jnp.asarray(qmc.generate_initial_guesses(num_starts, lbs, ubs), dt)
    theta = jnp.asarray(theta, dt)
    klbs = jnp.asarray(kernel_lbs, dt)
    kubs = jnp.asarray(kernel_ubs, dt)
    lbs_j = jnp.asarray(lbs, dt)
    ubs_j = jnp.asarray(ubs, dt)

    def make_rnstream(h):
        if use_low_discrepancy:
            # see run_nonmyopic_bo: reference Box-Muller log10 quirk parity
            z = qmc.gen_low_discrepancy_sequence(
                mc_iters, d, h + 1, log10_parity=log10_parity)
        else:
            z = rng.normal(size=(mc_iters, d + 1, h + 1))
        return jnp.asarray(z, dt)

    _shape_key = (capacity, d, str(dt), kernel.kind,
                  tuple(np.asarray(lbs).tolist()), tuple(np.asarray(ubs).tolist()))

    # one compiled acquisition program per distinct horizon, shared across
    # trials via the module program cache (see _cached_program)
    acquire_cache: dict[int, Callable] = {}

    def acquire_for(h):
        if h in acquire_cache:
            return acquire_cache[h]
        key = ("ad_acquire", rule, tuple(np.asarray(theta).tolist()), h,
               mc_iters, num_starts, num_restarts, sgd_iters, lr,
               solver_iterations, draw_mode, deterministic, ghq_nodes,
               log10_parity, _shape_key)
        fn = _cached_program(key, lambda: _build_acquire_for(h))
        acquire_cache[h] = fn
        return fn

    def _build_acquire_for(h):
        if deterministic:
            @jax.jit
            def acq(state, restarts):
                xs, vals = outer_mod.deterministic_solve_batch(
                    state, theta, lbs_j, ubs_j, xstarts, restarts, rule,
                    horizon=h, num_nodes=ghq_nodes, max_iters=sgd_iters,
                    lr=lr, inner_iterations=solver_iterations,
                    node_scale=_ghq_node_scale(log10_parity),
                )
                j = jnp.argmax(vals)
                return xs[j], vals[j]

            fn = lambda state, restarts, rnstream: acq(state, restarts)  # noqa: E731
        else:
            # rnstream placeholder: the program always substitutes its
            # rnstream argument (tp._replace), only the shape is traced
            tp0 = TrajectoryParams(
                x0=jnp.zeros((d,), dt), theta=theta, lbs=lbs_j,
                ubs=ubs_j, rnstream=jnp.zeros((mc_iters, d + 1, h + 1), dt),
            )
            program = outer_mod.make_fused_sga_program(
                state, tp0, rule, xstarts, max_iters=sgd_iters, lr=lr,
                inner_iterations=solver_iterations, draw_mode=draw_mode,
                select_best=True,
            )

            def fn(state, restarts, rnstream, program=program):
                return program(state, rnstream, restarts)

        return fn

    def _build_observe():
        @jax.jit
        def observe(state: sg.SurrogateState, xnext, do_mle):
            # observe + condition + masked MLE in one dispatch (see the
            # myopic loop's observe_step for the rationale)
            ynext = testfn.f(xnext)
            st = sg.condition(state, xnext, ynext)
            st_mle = sg.optimize_hypers(st, klbs, kubs)
            st = jax.tree.map(lambda a, bb: jnp.where(do_mle, bb, a), st, st_mle)
            return st, ynext

        return observe

    observe = _cached_program(
        ("nm_observe", id(testfn), tuple(np.asarray(kernel_lbs).tolist()),
         tuple(np.asarray(kernel_ubs).tolist()), _shape_key), _build_observe)
    fallback = _cached_program(
        ("nm_fallback", rule, tuple(np.asarray(theta).tolist()),
         num_starts, solver_iterations, _shape_key),
        lambda: _make_exploration_fallback(
            rule, theta, lbs_j, ubs_j, xstarts, solver_iterations))

    true_minimum = testfn.fmin
    initial_best = float(y_init.min())

    gaps = np.zeros(budget)
    regrets = np.zeros(budget)
    min_obs = np.zeros(budget)
    times = np.zeros(budget)
    allocations = np.zeros(budget)
    X_all = [np.asarray(x) for x in x_init]
    y_all = list(map(float, y_init))

    for b in range(budget):
        h = max(0, int(schedule(b, budget)))
        restarts = jnp.asarray(qmc.generate_batch(num_restarts, lbs, ubs), dt)
        rnstream = make_rnstream(h)
        mem0 = _device_peak_bytes()
        t0 = time.perf_counter()
        xnext, vbest = acquire_for(h)(state, restarts, rnstream)
        vb = float(vbest)
        if not np.isfinite(vb) or vb <= 0.0:
            xnext, _ = fallback(state)
        xnext.block_until_ready()
        times[b] = time.perf_counter() - t0
        allocations[b] = max(0, _device_peak_bytes() - mem0)

        best = min(y_all)
        gaps[b] = metrics.gap(initial_best, best, true_minimum)
        regrets[b] = metrics.simple_regret(true_minimum, best)

        state, ynext = observe(
            state, xnext, jnp.asarray((b + 1) % mle_every == 0))
        X_all.append(np.asarray(xnext))
        y_all.append(float(ynext))
        min_obs[b] = min(y_all)

    res = MyopicBOResult(
        X=np.stack(X_all),
        y=np.asarray(y_all),
        gaps=gaps,
        simple_regrets=regrets,
        minimum_observations=min_obs,
        times=times,
        state=state,
    )
    res.allocations = allocations
    return res

"""Outer policy optimization: SGA/Adam on the rollout acquisition.

TPU-native re-design of the reference outer layer
(`/root/reference/optimizers.jl`, `utils.jl:174-306`): the 50-iteration
SGA loop with the Mahsereci et al. early-stopping statistic becomes a
jit-compiled `lax.while_loop`; multi-restart outer solves vmap over the
batch of candidate starts (the intent of adaptive_bayesopt.jl:480,
502-525), which is also the axis the parallel layer shards across
devices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.rollout import mc as mc_mod
from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

__all__ = [
    "AdamState",
    "adam_init",
    "adam_update",
    "sga_update",
    "eswavs",
    "make_batched_grad_step",
    "make_batched_sga_step",
    "make_fused_sga_program",
    "make_scanned_sga_program",
    "stochastic_solve",
    "stochastic_solve_fused",
    "stochastic_solve_scanned",
    "stochastic_solve_stepped",
    "stochastic_solve_batch",
    "deterministic_solve",
    "deterministic_solve_batch",
]


class AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    t: jax.Array


def adam_init(x) -> AdamState:
    return AdamState(jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros((), jnp.int32))


def adam_update(state: AdamState, x, grad, *, lr=0.01, b1=0.9, b2=0.999, eps=1e-8):
    """Adam ascent step (reference optimizers.jl:25-75)."""
    t = state.t + 1
    m = b1 * state.m + (1 - b1) * grad
    v = b2 * state.v + (1 - b2) * grad * grad
    tf = t.astype(x.dtype)
    mhat = m / (1 - b1**tf)
    vhat = v / (1 - b2**tf)
    x_new = x + lr * mhat / (jnp.sqrt(vhat) + eps)
    return AdamState(m, v, t), x_new


def sga_update(x, grad, *, lr=0.01):
    """Plain SGA ascent step (reference optimizers.jl:6-22)."""
    return x + lr * grad


def eswavs(grad, var_grad, sample_size):
    """Early Stopping Without A Validation Set (Mahsereci et al.).

    reference: utils.jl:114-123. True => stop.
    """
    dim = grad.shape[0]
    # dtype-aware floor: 1e-300 underflows to 0 in f32 and would disarm
    # the divide-by-zero guard (a zero-grad/zero-std restart must freeze,
    # not produce NaN).
    floor = jnp.finfo(jnp.asarray(var_grad).dtype).tiny
    ratio = jnp.sum(grad**2 / jnp.maximum(var_grad, floor))
    return (1.0 - (sample_size / dim) * ratio) > 0.0


def stochastic_solve(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    start,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
):
    """SGA (Adam) ascent of the MC rollout acquisition from one start.

    reference: stochastic_solve (utils.jl:235-265): 50 Adam iterations of
    simulate -> eswavs early stop -> update, jitted here as one
    lax.while_loop. Returns (x_final, last ExpectedTrajectoryOutput).
    """
    dt = state.X.dtype
    start = jnp.asarray(start, dt)

    def simulate(x0):
        tpx = tp._replace(x0=x0)
        return mc_mod.simulate_trajectory_mc(
            state, tpx, rule, xstarts,
            with_gradients=True, iterations=inner_iterations,
            draw_mode=draw_mode,
        )

    def cond(carry):
        x, opt, it, done = carry
        return (~done) & (it < max_iters)

    def body(carry):
        x, opt, it, _ = carry
        eto = simulate(x)
        stop = eswavs(eto.grad_x, eto.std_grad_x**2, tp.mc_iters)
        opt2, x2 = adam_update(opt, x, eto.grad_x, lr=lr)
        x2 = jnp.clip(x2, tp.lbs, tp.ubs)
        x = jnp.where(stop, x, x2)
        return (x, opt2, it + 1, stop)

    x, _, _, _ = jax.lax.while_loop(
        cond, body, (start, adam_init(start), jnp.asarray(0, jnp.int32),
                     jnp.asarray(False))
    )
    return x, simulate(x)


def make_batched_grad_step(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    *,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
):
    """Jitted (values, grads, stds) over a batch of outer points.

    Building block for the host-stepped SGA loop (`stochastic_solve_stepped`):
    one device program per SGA iteration instead of a device-side while loop
    — drastically smaller programs (important where compile time/size is
    constrained), same math.
    """

    @jax.jit
    def step(st, rnstream, xs):
        def one(x0):
            eto = mc_mod.simulate_trajectory_mc(
                st, tp._replace(x0=x0, rnstream=rnstream), rule, xstarts,
                with_gradients=True, iterations=inner_iterations,
                draw_mode=draw_mode,
            )
            return eto.mu, eto.grad_x, eto.std_grad_x

        return jax.vmap(one)(xs)

    return step


def make_batched_sga_step(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    *,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
):
    """One fused device program: batched simulate + eswavs + Adam update.

    Carry is (xs, AdamState, done, vals); restarts whose eswavs statistic
    fires are frozen (reference utils.jl:235-265 semantics). Keeping the
    whole SGA update on device lets the host chain iterations through
    JAX's async dispatch without a per-iteration round-trip — with a
    tunneled device the host sync was costing as much as the compute.
    """

    @jax.jit
    def step(st, rnstream, carry):
        xs, opt, done, _ = carry
        dim = xs.shape[1]

        def one(x0):
            eto = mc_mod.simulate_trajectory_mc(
                st, tp._replace(x0=x0, rnstream=rnstream), rule, xstarts,
                with_gradients=True, iterations=inner_iterations,
                draw_mode=draw_mode,
            )
            return eto.mu, eto.grad_x, eto.std_grad_x

        vals, grads, stds = jax.vmap(one)(xs)
        # sample size from the stream actually simulated (not the
        # closed-over tp.mc_iters, which may be stale if the caller passes
        # a different-length rnstream); dtype-aware variance floor.
        sample_size = rnstream.shape[0]
        floor = jnp.finfo(stds.dtype).tiny
        ratio = jnp.sum(grads**2 / jnp.maximum(stds**2, floor), axis=1)
        stop = (1.0 - (sample_size / dim) * ratio) > 0.0
        done = done | stop
        opt2, xs_new = adam_update(opt, xs, grads, lr=lr)
        xs_new = jnp.clip(xs_new, tp.lbs, tp.ubs)
        xs = jnp.where(done[:, None], xs, xs_new)
        return (xs, opt2, done, vals)

    return step


def make_scanned_sga_program(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    *,
    steps_per_call: int = 10,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
):
    """k fused SGA iterations + a frozen final evaluation as ONE program.

    The per-iteration body is identical to `make_batched_sga_step`'s, run
    `steps_per_call` times under `lax.scan` and followed by one frozen
    evaluation reporting the values AT the post-scan points. Rationale
    (measured on the tunneled v5e): one SGA step is ~24 ms of device time
    but ~108 ms of per-dispatch host/tunnel overhead, so dispatching one
    program per iteration spends 2/3 of the wall clock idle; batching k
    iterations per dispatch amortizes that overhead k-fold while keeping
    the early-stop host check at the same `sync_every=k` cadence the
    stepped loop already used. Equivalence with the stepped loop is pinned
    by tests/test_adaptive.py::test_scanned_matches_stepped.

    The returned program carries a `steps_per_call` attribute so
    `stochastic_solve_scanned` derives its window count from the program's
    actual baked-in step count (a prebuilt program built with a different
    k than the solver's `steps_per_call` argument would otherwise silently
    change the total iteration count).
    """

    @jax.jit
    def program_impl(st, rnstream, carry):
        dim = carry[0].shape[1]

        def simulate_batch(xs):
            def one(x0):
                eto = mc_mod.simulate_trajectory_mc(
                    st, tp._replace(x0=x0, rnstream=rnstream), rule, xstarts,
                    with_gradients=True, iterations=inner_iterations,
                    draw_mode=draw_mode,
                )
                return eto.mu, eto.grad_x, eto.std_grad_x

            return jax.vmap(one)(xs)

        def body(c, _):
            xs, opt, done, vals = c
            vals, grads, stds = simulate_batch(xs)
            sample_size = rnstream.shape[0]
            floor = jnp.finfo(stds.dtype).tiny
            ratio = jnp.sum(grads**2 / jnp.maximum(stds**2, floor), axis=1)
            stop = (1.0 - (sample_size / dim) * ratio) > 0.0
            done = done | stop
            opt2, xs_new = adam_update(opt, xs, grads, lr=lr)
            xs_new = jnp.clip(xs_new, tp.lbs, tp.ubs)
            xs = jnp.where(done[:, None], xs, xs_new)
            return (xs, opt2, done, vals), None

        carry, _ = jax.lax.scan(body, carry, None, length=steps_per_call)
        xs, opt, done, _ = carry
        vals, _, _ = simulate_batch(xs)  # frozen: values AT the final points
        return (xs, opt, done, vals)

    return _ScannedSGAProgram(program_impl, steps_per_call)


class _ScannedSGAProgram:
    """Callable wrapper pairing a jitted scanned-SGA program with its k.

    jit-compiled callables do not accept attribute assignment, so the
    baked-in `steps_per_call` rides on this thin wrapper instead.
    """

    def __init__(self, fn, steps_per_call: int):
        self._fn = fn
        self.steps_per_call = int(steps_per_call)

    def __call__(self, st, rnstream, carry):
        return self._fn(st, rnstream, carry)


def stochastic_solve_scanned(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    *,
    max_iters: int = 50,
    steps_per_call: int = 10,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
    program=None,
):
    """Multi-restart SGA with k iterations fused per device dispatch.

    Same per-iteration math and early-exit cadence as
    `stochastic_solve_stepped(sync_every=steps_per_call)`, but
    ceil(max_iters/k) dispatches instead of max_iters, which removes the
    per-dispatch tunnel overhead from the critical path. Note the total
    iteration count rounds UP to a whole number of windows:
    ceil(max_iters/k)*k iterations run when max_iters is not a multiple of
    k (extra iterations past an exact-multiple max_iters only continue the
    same ascent and are frozen per-restart once eswavs fires). When a
    prebuilt `program` is passed, its baked-in `steps_per_call` attribute
    overrides the `steps_per_call` argument. Returns (xs (R, d),
    values (R,)); the returned values are evaluated at the final points
    (frozen evaluation inside the same program).
    """
    import numpy as np

    dt = state.X.dtype
    xs = jnp.asarray(starts, dt)
    prog = program or make_scanned_sga_program(
        state, tp, rule, xstarts, steps_per_call=steps_per_call,
        lr=lr, inner_iterations=inner_iterations, draw_mode=draw_mode,
    )
    steps_per_call = getattr(prog, "steps_per_call", steps_per_call)

    opt = AdamState(jnp.zeros_like(xs), jnp.zeros_like(xs), jnp.zeros((), jnp.int32))
    done = jnp.zeros((xs.shape[0],), bool)
    vals = jnp.zeros((xs.shape[0],), dt)
    carry = (xs, opt, done, vals)
    n_windows = -(-max_iters // steps_per_call)
    for _ in range(n_windows):
        carry = prog(state, tp.rnstream, carry)
        if bool(np.all(np.asarray(carry[2]))):
            break
    xs, _, _, vals = carry
    return xs, vals


def make_fused_sga_program(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
    select_best: bool = False,
):
    """The ENTIRE multi-restart SGA solve as one device program.

    A `lax.while_loop` over the per-iteration body of
    `make_batched_sga_step` with a device-side all-stopped early exit,
    followed by the frozen final evaluation — so one dispatch replaces the
    scanned program's ceil(max_iters/k) dispatches AND the loop stops at
    the exact iteration the eswavs statistic freezes the last restart
    (the scanned program always completes its k-iteration window).
    Semantics identical to `stochastic_solve_stepped(sync_every=1)`:
    pinned by tests/test_adaptive.py::test_fused_matches_stepped.

    Returns a jitted `(state, rnstream, xs0) -> (xs, vals)` callable;
    `vals` are evaluated at the final points. With `select_best=True` the
    argmax winner selection also runs on device and the program returns
    `(x_best (d,), v_best ())` — one dispatch and one small transfer per
    acquisition instead of three (solve, argmax, gather), which matters
    when every dispatch pays a host<->device round-trip.
    """

    @jax.jit
    def program(st, rnstream, xs0):
        dim = xs0.shape[1]
        sample_size = rnstream.shape[0]

        def simulate_batch(xs):
            def one(x0):
                eto = mc_mod.simulate_trajectory_mc(
                    st, tp._replace(x0=x0, rnstream=rnstream), rule, xstarts,
                    with_gradients=True, iterations=inner_iterations,
                    draw_mode=draw_mode,
                )
                return eto.mu, eto.grad_x, eto.std_grad_x

            return jax.vmap(one)(xs)

        def cond(c):
            xs, opt, done, it = c
            return (~jnp.all(done)) & (it < max_iters)

        def body(c):
            xs, opt, done, it = c
            _, grads, stds = simulate_batch(xs)
            floor = jnp.finfo(stds.dtype).tiny
            ratio = jnp.sum(grads**2 / jnp.maximum(stds**2, floor), axis=1)
            stop = (1.0 - (sample_size / dim) * ratio) > 0.0
            done = done | stop
            opt2, xs_new = adam_update(opt, xs, grads, lr=lr)
            xs_new = jnp.clip(xs_new, tp.lbs, tp.ubs)
            xs = jnp.where(done[:, None], xs, xs_new)
            return (xs, opt2, done, it + 1)

        opt0 = AdamState(jnp.zeros_like(xs0), jnp.zeros_like(xs0),
                         jnp.zeros((), jnp.int32))
        done0 = jnp.zeros((xs0.shape[0],), bool)
        xs, _, _, _ = jax.lax.while_loop(
            cond, body, (xs0, opt0, done0, jnp.asarray(0, jnp.int32)))

        # frozen: values AT the final points (value-only — no gradients)
        def value_one(x0):
            eto = mc_mod.simulate_trajectory_mc(
                st, tp._replace(x0=x0, rnstream=rnstream), rule, xstarts,
                with_gradients=False, iterations=inner_iterations,
                draw_mode=draw_mode,
            )
            return eto.mu

        vals = jax.vmap(value_one)(xs)
        if select_best:
            j = jnp.argmax(vals)
            return xs[j], vals[j]
        return xs, vals

    return program


def stochastic_solve_fused(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
    program=None,
):
    """Multi-restart SGA in ONE device dispatch (see make_fused_sga_program).

    Same math and results as `stochastic_solve_stepped(sync_every=1)` but
    with device-side exact early exit and no per-iteration tunnel
    round-trips. Returns (xs (R, d), values (R,)).
    """
    dt = state.X.dtype
    xs = jnp.asarray(starts, dt)
    prog = program or make_fused_sga_program(
        state, tp, rule, xstarts, max_iters=max_iters, lr=lr,
        inner_iterations=inner_iterations, draw_mode=draw_mode,
    )
    return prog(state, tp.rnstream, xs)


def stochastic_solve_stepped(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
    grad_step=None,
    sga_step=None,
    sync_every: int = 10,
):
    """Host-chained multi-restart SGA (same semantics as the fused batch).

    Dispatches one fused device program per SGA iteration (simulate +
    eswavs freeze + Adam, see make_batched_sga_step) and only synchronizes
    with the device every `sync_every` iterations to test the all-stopped
    early exit — async dispatch keeps the device busy in between. Returns
    (xs (R, d), values (R,)).

    `grad_step` is accepted for backward compatibility and ignored when
    `sga_step` is provided.
    """
    import numpy as np

    dt = state.X.dtype
    xs = jnp.asarray(starts, dt)
    step = sga_step or make_batched_sga_step(
        state, tp, rule, xstarts,
        lr=lr, inner_iterations=inner_iterations, draw_mode=draw_mode,
    )

    opt = AdamState(jnp.zeros_like(xs), jnp.zeros_like(xs), jnp.zeros((), jnp.int32))
    done = jnp.zeros((xs.shape[0],), bool)
    vals = jnp.zeros((xs.shape[0],), dt)
    carry = (xs, opt, done, vals)
    for it in range(max_iters):
        carry = step(state, tp.rnstream, carry)
        if (it + 1) % sync_every == 0 and bool(np.all(np.asarray(carry[2]))):
            break
    xs, opt, _, _ = carry
    # one frozen evaluation to report the values AT the final points
    all_done = jnp.ones((xs.shape[0],), bool)
    _, _, _, vals = step(state, tp.rnstream, (xs, opt, all_done, vals))
    return xs, vals


def deterministic_solve(
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
    max_iters: int = 50,
    lr: float = 0.01,
    grad_tol: float = 1e-4,
    inner_iterations: int = 12,
    node_scale: float = 1.0,
):
    """SAA (Gauss-Hermite) ascent of the rollout acquisition from one start.

    reference: deterministic_solve (utils.jl:267-306) — the SGA loop on the
    variance-free GHQ estimate, stopping on ||grad|| < grad_tol. Expressed
    as one lax.while_loop over Adam updates of the quadrature objective.
    Returns (x_final, ExpectedTrajectoryOutput at x_final).
    """
    dt = state.X.dtype
    x0 = jnp.asarray(x0, dt)
    theta = jnp.asarray(theta, dt)
    lbs = jnp.asarray(lbs, dt)
    ubs = jnp.asarray(ubs, dt)

    def simulate(x):
        return mc_mod.simulate_trajectory_ghq(
            state, x, theta, lbs, ubs, xstarts, rule,
            horizon=horizon, num_nodes=num_nodes,
            with_gradients=True, iterations=inner_iterations,
            node_scale=node_scale,
        )

    def cond(carry):
        x, opt, it, done = carry
        return (~done) & (it < max_iters)

    def body(carry):
        x, opt, it, _ = carry
        eto = simulate(x)
        stop = jnp.linalg.norm(eto.grad_x) < grad_tol
        opt2, x2 = adam_update(opt, x, eto.grad_x, lr=lr)
        x2 = jnp.clip(x2, lbs, ubs)
        x = jnp.where(stop, x, x2)
        return (x, opt2, it + 1, stop)

    x, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, adam_init(x0), jnp.asarray(0, jnp.int32),
                     jnp.asarray(False))
    )
    return x, simulate(x)


def deterministic_solve_batch(
    state: sg.SurrogateState,
    theta,
    lbs,
    ubs,
    xstarts,
    starts,
    rule: DecisionRule,
    *,
    horizon: int,
    num_nodes: int = 8,
    max_iters: int = 50,
    lr: float = 0.01,
    grad_tol: float = 1e-4,
    inner_iterations: int = 12,
    node_scale: float = 1.0,
):
    """vmap of deterministic_solve over a batch of outer restarts."""

    def one(s):
        x, eto = deterministic_solve(
            state, s, theta, lbs, ubs, xstarts, rule,
            horizon=horizon, num_nodes=num_nodes, max_iters=max_iters,
            lr=lr, grad_tol=grad_tol, inner_iterations=inner_iterations,
            node_scale=node_scale,
        )
        return x, eto.mu

    return jax.vmap(one)(jnp.asarray(starts, state.X.dtype))


def stochastic_solve_batch(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
):
    """vmap of stochastic_solve over a batch of outer restarts.

    Returns (xs (R, d), values (R,)): final points and their rollout
    acquisition estimates — pick the argmax for the next BO sample
    (adaptive_bayesopt.jl:502-525 intent).
    """

    def one(s):
        x, eto = stochastic_solve(
            state, tp, rule, xstarts, s,
            max_iters=max_iters, lr=lr,
            inner_iterations=inner_iterations, draw_mode=draw_mode,
        )
        return x, eto.mu

    return jax.vmap(one)(jnp.asarray(starts, state.X.dtype))

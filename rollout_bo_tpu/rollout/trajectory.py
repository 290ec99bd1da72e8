"""Rollout trajectories: h-step fantasized BO as a differentiable lax.scan.

TPU-native re-design of the reference rollout engine
(`/root/reference/rollout.jl:39-124`, `trajectory.jl`, `observables.jl`)
and its adjoint (`rollout.jl:126-277`, math in
`docs/adjoint_mode_response.tex`).

The reference hand-rolls the reverse sweep with perturbation surrogates
and back-substitution. Here the SAME math falls out of `jax.grad` through
the scan, given two local derivative rules, both implemented with the
stop-gradient linearization trick (primal unchanged, derivative defined):

1. **Sample-path draws** (`sample_path_draw`): a fantasy observation
   y_j = f~(x_j) is treated as an evaluation of a fixed GP sample path:
   dy_j/dx_j = the *drawn* gradient (the (d+1)-joint draw's gradient
   rows), and the draw has no derivative w.r.t. the conditioning state or
   the noise column. This matches the reference observable semantics
   (observables.jl:106-124: get_gradient returns the drawn gradients) and
   case 2 of `gradient(T)` (rollout.jl:249).

2. **Inner argmax** (`argmax_with_ift`): x_j* solves grad alpha = 0; the
   implicit-function theorem gives dx*/dp = -H^{-1} d(grad alpha)/dp —
   identical math to the reference's dual solve x_bar = H^T \\ rhs
   (rollout.jl:188). Degenerate Hessians and boundary solutions get a
   zero derivative (reference singularity guard rollout.jl:159-161; note
   the reference tests `det(H) < htol` which zeroes *every* odd-dimension
   solve since det(H) < 0 at a maximum — we use |det| instead).

The reward max(fmini - min_j y_j, 0) (rollout.jl:108-111,
observables.jl:12-14) is nonsmooth; jnp's min/max subgradients reproduce
the reference's three-case analysis (rollout.jl:241-249) automatically.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from rollout_bo_tpu.models import fantasy as fant
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.ops import small_chol
from rollout_bo_tpu.rollout import solvers

__all__ = [
    "TrajectoryParams",
    "TrajectoryRecord",
    "ExpectedTrajectoryOutput",
    "sample_path_draw",
    "argmax_with_ift",
    "rollout_trajectory",
    "trajectory_reward",
    "base_fmini",
]

_stop = jax.lax.stop_gradient


class TrajectoryParams(NamedTuple):
    """Mirror of reference TrajectoryParameters (trajectory.jl:43-106).

    rnstream: (mc_iters, d+1, horizon+1) standard-normal tensor (one
    (f, grad f) joint-draw column per step, fixed for CRN variance
    reduction).
    """

    x0: jax.Array
    theta: jax.Array
    lbs: jax.Array
    ubs: jax.Array
    rnstream: jax.Array

    @property
    def horizon(self) -> int:
        return self.rnstream.shape[2] - 1

    @property
    def mc_iters(self) -> int:
        return self.rnstream.shape[0]


class TrajectoryRecord(NamedTuple):
    """One rolled-out trajectory (reference `sample(T)`, rollout.jl:85-98)."""

    xs: jax.Array      # (h+1, d) sampled locations (x0 first)
    ys: jax.Array      # (h+1,) fantasy observations
    grads: jax.Array   # (h+1, d) sample-path gradients at each location


class ExpectedTrajectoryOutput(NamedTuple):
    """MC-averaged trajectory outcome (reference trajectory.jl:112-134)."""

    mu: jax.Array
    std_mu: jax.Array
    grad_x: jax.Array | None = None
    std_grad_x: jax.Array | None = None
    grad_theta: jax.Array | None = None
    std_grad_theta: jax.Array | None = None


def base_fmini(fs: fant.FantasyState):
    """Incumbent: min over *base* observations (reference rollout.jl:109).

    (The reference takes `minimum` over the full padded vector — a latent
    bug when capacity > n; we use the active minimum, the intended
    semantics.)
    """
    rows = jnp.arange(fs.capacity)
    big = jnp.asarray(jnp.finfo(fs.y.dtype).max, fs.y.dtype)
    return jnp.min(jnp.where(rows < fs.n_base, fs.y, big))


def sample_path_draw(st: sg.SurrogateState, x, z):
    """Joint (f, grad f) fantasy draw with sample-path derivative semantics.

    Returns (y, grad_y). Primal: y = [dmu + chol(joint cov) z]_0, the
    reference gp_draw with with_gradient=true (rbs.jl:588-611). Derivative:
    dy/dx = grad_y (the drawn gradient rows); no derivative w.r.t. the
    surrogate state or z — the sample path f~ is treated as a fixed
    function, matching the reference adjoint's use of observable gradients
    (observables.jl:124, rollout.jl:164).
    """
    draw = sg.gp_draw_joint(st, x, z)
    y = _stop(draw[0])
    gy = _stop(draw[1:])
    y = y + jnp.dot(gy, x - _stop(x))
    return y, gy


def argmax_with_ift(
    fs: fant.FantasyState,
    fi,
    rule: DecisionRule,
    theta,
    lbs,
    ubs,
    xstarts,
    *,
    iterations: int = 12,
    htol: float = 1e-4,
    boundary_tol: float = 1e-8,
):
    """Inner acquisition argmax, differentiable via the IFT.

    Forward: multistart projected Newton on the fantasy view (the solver
    itself is never differentiated). Backward: the stop-gradient
    linearization  x_out = x* - H^{-1}(g(p) - stop(g(p)))  has primal x*
    and derivative dx_out/dp = -H^{-1} dg/dp — the reference's dual solve
    (rollout.jl:150-191) generated by autodiff instead of by hand. The
    derivative is zeroed when H is near-singular or x* is pinned to the
    box boundary (stationarity fails there).
    """
    st = fant.view(fs, fi)
    st_sg = jax.tree.map(_stop, st)
    xstar, _ = solvers.maximize_hot(
        st_sg, rule, _stop(theta), lbs, ubs, xstarts, iterations=iterations
    )  # already gradient-free (stopped inputs; Pallas route on TPU)

    # differentiable stationarity residual g(fs, theta) at fixed xstar
    _, g = sg.acquisition_grad(st, rule, xstar, theta)
    # fixed Hessian at the solution
    _, _, H = sg.acquisition_value_grad_hess(st_sg, rule, xstar, _stop(theta))

    # KKT-reduced IFT: coordinates pinned to the box boundary are held
    # fixed (their sensitivity is 0 while the constraint stays active);
    # the free block gets the exact implicit derivative. Identity rows on
    # the pinned block make det(Hm) the free-block determinant.
    free = (
        (xstar > jnp.asarray(lbs) + boundary_tol)
        & (xstar < jnp.asarray(ubs) - boundary_tol)
    ).astype(H.dtype)
    # pinned block gets -1 on the diagonal so that -Hm is PD iff the free
    # block of -H is PD (pinned rows are decoupled; gm is 0 there)
    Hm = H * free[:, None] * free[None, :] - jnp.diag(1.0 - free)
    gm = g * free
    # Near-singularity guard. The reference tests det(H) < 1e-4
    # (rollout.jl:159-161) which is dimension-unaware (det ~ lambda^d
    # underflows for flat acquisitions in 10d, and is negative for odd d
    # at any maximum). Instead: at a proper constrained maximum -Hm must
    # be positive definite with relative margin htol, checked by whether
    # chol(-Hm - htol*s*I) succeeds (s = diagonal scale). Cholesky is
    # used instead of an eigendecomposition to keep the TPU program small.
    d = H.shape[0]
    eye = jnp.eye(d, dtype=H.dtype)
    A = -Hm
    s = jnp.max(jnp.abs(jnp.diagonal(A)))
    # PD-with-margin test on the free block only (pinned diag stays 1)
    L_test = small_chol.chol_small(A - htol * s * jnp.diag(free))
    ok_h = jnp.all(jnp.isfinite(L_test)) & (s > 1e-12)
    # sanitize BEFORE the solve: a singular solve poisons the backward
    # pass with NaN even when the primal result is masked out
    A_safe = jnp.where(ok_h, A, eye)
    rhs = -(gm - _stop(gm))  # Hm delta = gm - stop(gm)  =>  A delta = -(...)
    delta = small_chol.spd_solve_small(A_safe, rhs) * free
    delta = jnp.where(jnp.all(jnp.isfinite(delta)) & ok_h, delta, 0.0)
    return xstar - delta


def rollout_core(
    fs: fant.FantasyState,
    x0,
    theta,
    lbs,
    ubs,
    xstarts,
    rule: DecisionRule,
    draw_fn,
    horizon: int,
    *,
    iterations: int = 12,
):
    """Roll out one fantasized trajectory (reference rollout!, rollout.jl:39-74).

    draw_fn(st_view, x, step) -> (y, grad_y) is the observable mechanism
    (reference observables.jl): stochastic sample-path draws, Gauss-Hermite
    nodes, or ground-truth evaluations. Step 0 draws at the *given* x0 (no
    solve); steps 1..h alternate {argmax at fantasy_index j-1 -> draw ->
    rank-1 condition}. Returns (final FantasyState, TrajectoryRecord).
    """
    y0, g0 = draw_fn(fant.view(fs, -1), x0, 0)
    fs = fant.fantasy_condition(fs, x0, y0)

    def step(fs, j):
        fi = fs.m - 1
        xj = argmax_with_ift(
            fs, fi, rule, theta, lbs, ubs, xstarts, iterations=iterations
        )
        yj, gj = draw_fn(fant.view(fs, fi), xj, j)
        fs = fant.fantasy_condition(fs, xj, yj)
        return fs, (xj, yj, gj)

    if horizon > 0:
        fs, (xs, ys, gs) = jax.lax.scan(step, fs, jnp.arange(1, horizon + 1))
        xs = jnp.concatenate([x0[None, :], xs], axis=0)
        ys = jnp.concatenate([y0[None], ys])
        gs = jnp.concatenate([g0[None, :], gs], axis=0)
    else:
        xs, ys, gs = x0[None, :], y0[None], g0[None, :]

    return fs, TrajectoryRecord(xs=xs, ys=ys, grads=gs)


def rollout_trajectory(
    fs: fant.FantasyState,
    x0,
    theta,
    lbs,
    ubs,
    xstarts,
    zstream,
    rule: DecisionRule,
    *,
    iterations: int = 12,
    draw_mode: str = "reparam",
):
    """Stochastic rollout; zstream: (d+1, h+1) normals.

    draw_mode: see observables.stochastic_observable — "reparam" (exact
    pathwise differentiation, default) or "sample_path" (reference
    coupling).
    """
    from rollout_bo_tpu.rollout import observables as _obs

    horizon = zstream.shape[1] - 1
    return rollout_core(
        fs, x0, theta, lbs, ubs, xstarts, rule,
        _obs.stochastic_observable(zstream, mode=draw_mode), horizon,
        iterations=iterations,
    )


def trajectory_reward(
    fs: fant.FantasyState,
    x0,
    theta,
    lbs,
    ubs,
    xstarts,
    zstream,
    rule: DecisionRule,
    *,
    iterations: int = 12,
    draw_mode: str = "reparam",
):
    """Reward of one rolled-out trajectory: max(fmini - min_j y_j, 0).

    reference: resolve(T) (rollout.jl:108-111) with the observable's
    best_observation (observables.jl:9-14). Differentiable w.r.t. x0 and
    theta; jax.grad of this function IS the reference's adjoint
    `gradient(T)` (rollout.jl:233-277) in draw_mode="sample_path", and the
    exact fixed-stream pathwise gradient in draw_mode="reparam".
    """
    fmini = base_fmini(fs)
    _, rec = rollout_trajectory(
        fs, x0, theta, lbs, ubs, xstarts, zstream, rule,
        iterations=iterations, draw_mode=draw_mode,
    )
    best = jnp.min(rec.ys)
    return jnp.maximum(fmini - best, 0.0)

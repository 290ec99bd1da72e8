"""Inner (myopic) acquisition maximization: batched projected Newton.

TPU-native re-design of `/root/reference/rbf_optim.jl`: the reference
solves each of ~66 multistart guesses with a serial Optim.IPNewton
(rbf_optim.jl:82-94, x_tol=f_tol=1e-3); here *all* starts run
simultaneously as a vmapped fixed-iteration projected-Newton with
eigenvalue-clipped Hessians and a batched backtracking candidate search —
no data-dependent control flow, everything tiles onto the MXU/VPU.

The winner is selected by argmax over starts with NaN filtering
(reference rbf_optim.jl:96-98).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import small_chol
from rollout_bo_tpu.models.decision_rules import DecisionRule

__all__ = [
    "newton_solve_batch",
    "multistart_maximize",
    "maximize_hot",
    "SolveResult",
    "pallas_enabled",
]


# "auto": use the Pallas lane-vectorized kernel on TPU backends for f32
# states with supported kernel/rule; "1"/"0" force on/off; "interpret"
# forces the kernel through the Pallas interpreter (CPU testing).
_PALLAS_MODE = os.environ.get("ROLLOUT_BO_TPU_PALLAS", "auto")


def pallas_enabled(state: sg.SurrogateState, rule: DecisionRule) -> bool:
    from rollout_bo_tpu.ops import pallas_newton as pn

    if _PALLAS_MODE == "0":
        return False
    if getattr(rule, "cost", None) is not None:
        # cost-aware rules need the x-dependent 1/c(x) channel, which the
        # lane kernel does not implement — use the XLA solver path
        return False
    if not pn.supported(state.kernel.kind, rule.name):
        return False
    if state.X.dtype not in (jnp.float32, jnp.float64):
        return False
    want_theta = (2,) if state.kernel.kind == "periodic" else (1,)
    if state.kernel.theta.shape != want_theta:
        return False
    if _PALLAS_MODE in ("1", "interpret"):
        return True
    if state.X.dtype == jnp.float64:
        # f64 lanes are implemented and interpret-verified
        # (tests/test_pallas_newton.py); on a real chip they are opt-in
        # via mode "1" until Mosaic f64 lowering is validated there (the
        # TPU VPU has no native f64 ALU, so auto-routing f64 states to the
        # kernel risks a compile failure mid-experiment).
        return False
    return jax.default_backend() not in ("cpu",)


class SolveResult(NamedTuple):
    x: jax.Array       # (d,) argmax
    value: jax.Array   # alpha at the argmax
    xs: jax.Array      # (S, d) per-start solutions
    values: jax.Array  # (S,) per-start values


_BACKTRACK_STEPS = 9  # trial step sizes 1, 1/2, ..., 1/2^8 (+ "stay put")


def _clipped_newton_direction(g, H, ridge):
    """Ascent direction from damped -H (Levenberg-style modified Newton).

    Two batched Cholesky attempts: (a) the undamped system -H + ridge*I,
    and (b) a Gershgorin-certified shift tau_g that guarantees positive
    definiteness (tau_g = max(0, max_i(offdiag row sum - diag)) — every
    Gershgorin disc of A + tau_g I lies in the right half line). The least
    damped finite ascent direction wins; a scaled gradient is the final
    fallback. This replaces an escalating 6-level damping ladder — the
    per-iteration Cholesky work dominated the whole inner solve on TPU and
    measured argmaxes were identical. Cholesky is used instead of an
    eigendecomposition deliberately: eigh lowers to a very large HLO
    program on TPU and dominated compile time inside the nested rollout
    scans.
    """
    d = g.shape[0]
    A = -H
    diag = jnp.diagonal(A)
    s = jnp.maximum(jnp.max(jnp.abs(diag)), ridge)
    off = jnp.sum(jnp.abs(A), axis=1) - jnp.abs(diag)
    tau_g = jnp.maximum(jnp.max(off - diag), 0.0) + ridge + 1e-6 * s
    eye = jnp.eye(d, dtype=g.dtype)

    def solve_one(tau):
        # unrolled small-SPD solve (NaN if not PD); avoids the TPU
        # "Cholesky" custom call that dominated the inner solve (84% in
        # profiler traces at the headline benchmark scale)
        p = small_chol.spd_solve_small(A + tau * eye, g)
        ok = jnp.all(jnp.isfinite(p)) & (jnp.dot(p, g) > 0.0)
        return p, ok

    taus = jnp.stack([jnp.asarray(ridge, g.dtype), tau_g])
    ps, oks = jax.vmap(solve_one)(taus)
    # first (least damped) valid solve; fall back to scaled gradient
    idx = jnp.argmax(oks)
    any_ok = jnp.any(oks)
    p = jnp.where(any_ok, ps[idx], g / s)
    return p


def newton_solve_batch(
    state: sg.SurrogateState,
    rule: DecisionRule,
    theta,
    lbs,
    ubs,
    xstarts,
    *,
    iterations: int = 12,
    ridge: float = 1e-8,
):
    """Run projected-Newton ascent from every start simultaneously.

    xstarts: (S, d). Returns (xs, values): per-start solutions and
    acquisition values (NaN-safe: non-finite values map to -inf).
    """
    dt = state.X.dtype
    lbs = jnp.asarray(lbs, dt)
    ubs = jnp.asarray(ubs, dt)
    theta = jnp.asarray(theta, dt)
    xstarts = jnp.asarray(xstarts, dt)
    scale = jnp.max(ubs - lbs)

    def value(x):
        return sg.acquisition(state, rule, x, theta)

    boundary_tol = 1e-9 * scale
    # IPNewton-style loose acceptance (reference rbf_optim.jl:26-30,
    # Optim.Options(x_tol=1e-3, f_tol=1e-3)): a start freezes once its
    # relative value improvement or step norm drops below tolerance.
    # Static python flag: 0.0 tolerances compile to the original loop.
    f_tol = float(getattr(rule, "solve_f_tol", 0.0) or 0.0)
    x_tol = float(getattr(rule, "solve_x_tol", 0.0) or 0.0)
    loose = f_tol > 0.0 or x_tol > 0.0

    def one_iteration(x, _):
        a, g, H = sg.acquisition_value_grad_hess(state, rule, x, theta)
        # active-set reduction: coordinates pinned at a bound with the
        # ascent gradient pointing outward are frozen, and the Newton
        # system is solved on the free block only (otherwise the full
        # Newton direction is polluted by the pinned coordinates' large
        # outward gradients and the free coordinates stall).
        act_lo = (x <= lbs + boundary_tol) & (g < 0.0)
        act_hi = (x >= ubs - boundary_tol) & (g > 0.0)
        free = (~(act_lo | act_hi)).astype(x.dtype)
        gf = g * free
        Hf = H * free[:, None] * free[None, :] - jnp.diag(1.0 - free)
        p = _clipped_newton_direction(gf, Hf, ridge) * free
        # always also consider a scaled gradient-ascent direction: the
        # damped Newton step can overshoot a narrow peak when A is barely
        # PD, and the gradient candidates guarantee progress
        bad = ~jnp.all(jnp.isfinite(p)) | (jnp.dot(p, gf) <= 0.0)
        gnorm = jnp.linalg.norm(gf)
        gstep = gf / jnp.maximum(gnorm, 1e-12) * (0.1 * scale)
        p = jnp.where(bad, gstep, p)
        # cap the step so the backtracking grid always contains usable
        # candidates even when the clipped Hessian is tiny
        pnorm = jnp.linalg.norm(p)
        p = p * jnp.minimum(1.0, scale / jnp.maximum(pnorm, 1e-300))

        # batched backtracking over both directions
        ts = 0.5 ** jnp.arange(_BACKTRACK_STEPS, dtype=dt)
        cands = jnp.concatenate([
            x[None, :] + ts[:, None] * p[None, :],
            x[None, :] + ts[:, None] * gstep[None, :],
        ])
        cands = jnp.clip(cands, lbs, ubs)
        vals = jax.vmap(value)(cands)
        vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
        a0 = jnp.where(jnp.isfinite(a), a, -jnp.inf)
        best = jnp.argmax(vals)
        improved = vals[best] > a0
        xn = jnp.where(improved, cands[best], x)
        return xn, a0, vals[best]

    if not loose:
        def step(x, _):
            xn, _, _ = one_iteration(x, None)
            return xn, None
    else:
        def step(carry, _):
            x, frozen = carry
            xn_cand, a0, vbest = one_iteration(x, None)
            improvement = jnp.maximum(vbest - a0, 0.0)
            small_f = improvement <= f_tol * (jnp.abs(a0) + f_tol)
            small_x = jnp.linalg.norm(xn_cand - x) <= x_tol
            xn = jnp.where(frozen, x, xn_cand)
            return (xn, frozen | small_f | small_x), None

    def solve_one(x0):
        x0 = jnp.clip(x0, lbs, ubs)
        if not loose:
            xf, _ = jax.lax.scan(step, x0, None, length=iterations)
        else:
            (xf, _), _ = jax.lax.scan(
                step, (x0, jnp.zeros((), bool)), None, length=iterations)
        vf = value(xf)
        return xf, jnp.where(jnp.isfinite(vf), vf, -jnp.inf)

    return jax.vmap(solve_one)(xstarts)


def multistart_maximize(
    state: sg.SurrogateState,
    rule: DecisionRule,
    theta,
    lbs,
    ubs,
    xstarts,
    *,
    iterations: int = 12,
    key: jax.Array | None = None,
) -> SolveResult:
    """Multistart acquisition maximization (reference multistart_base_solve!).

    For the "Random" rule, returns a uniform sample from the box using
    `key` (reference rbf_optim.jl:76-79,110-113).
    """
    dt = state.X.dtype
    lbs = jnp.asarray(lbs, dt)
    ubs = jnp.asarray(ubs, dt)

    if rule.name == "Random":
        if key is None:
            raise ValueError("Random acquisition requires a PRNG key")
        d = state.dim
        u = jax.random.uniform(key, (d,), dtype=dt)
        x = lbs + (ubs - lbs) * u
        S = jnp.asarray(xstarts, dt).shape[0]
        return SolveResult(
            x, jnp.zeros((), dt), jnp.tile(x, (S, 1)), jnp.zeros((S,), dt)
        )

    xs, values = newton_solve_batch(
        state, rule, theta, lbs, ubs, xstarts, iterations=iterations
    )
    j = jnp.argmax(values)
    return SolveResult(xs[j], values[j], xs, values)


def maximize_hot(
    state: sg.SurrogateState,
    rule: DecisionRule,
    theta,
    lbs,
    ubs,
    xstarts,
    *,
    iterations: int = 12,
):
    """(xstar, value) multistart argmax for the rollout hot path.

    Routes to the Pallas lane-vectorized kernel (ops/pallas_newton.py) when
    enabled/supported — composable under any vmap nesting, each vmap axis
    collapsing into the kernel's flat lane dimension — and otherwise to
    the vmapped-XLA `newton_solve_batch`. The two paths agree to f32
    op-ordering noise with identical argmax basins (scripts/
    ab_pallas_solver.py: 100% argmax agreement at benchmark scale).
    """
    if pallas_enabled(state, rule):
        from rollout_bo_tpu.ops import pallas_newton as pn

        solve_one = pn.get_solver(
            state.kernel.kind, rule.name, iterations,
            interpret=_PALLAS_MODE == "interpret",
            f_tol=float(getattr(rule, "solve_f_tol", 0.0) or 0.0),
            x_tol=float(getattr(rule, "solve_x_tol", 0.0) or 0.0),
        )
        dt = state.X.dtype
        kth = state.kernel.theta
        period = kth[1] if state.kernel.kind == "periodic" else jnp.ones((), dt)
        return solve_one(
            state.X, state.Li, state.c, state.n,
            sg.get_active_minimum(state),
            jnp.asarray(theta, dt)[0],
            kth[0],
            jnp.asarray(lbs, dt), jnp.asarray(ubs, dt),
            jnp.asarray(xstarts, dt), period,
        )
    res = multistart_maximize(
        state, rule, theta, lbs, ubs, xstarts, iterations=iterations)
    return res.x, res.value

"""Explicit adjoint (reverse) differentiation of a rolled-out trajectory.

Hand-rolled parity implementation of the reference's trajectory adjoint
`gradient(T)` (`/root/reference/rollout.jl:126-277`; math in
`docs/adjoint_mode_response.tex:35-171`), independent of JAX's reverse
mode through the rollout scan. The production gradient path is
`jax.grad(trajectory_reward)` (rollout/trajectory.py) — this module
exists (a) for component parity with the reference's
solve_dual_x/solve_dual_y/gather_g/gather_q machinery and (b) as an
independent cross-check of the autodiff route (they must agree in
draw_mode="sample_path"; pinned by tests/test_adjoint.py).

Structure mirror (reference -> here):
- best(T) three-case analysis (rollout.jl:236-249)  -> `gradient_adjoint`
  cases: no improvement -> 0; best at step 0 -> exact -grad y_0;
  else back-substitution.
- solve_dual_x (rollout.jl:150-191): the per-step dual
  x_bar_j = H_j^{-T} rhs with the near-singular-Hessian guard  ->
  `_constraint_dual` (same Cholesky-margin PD test as the forward IFT,
  instead of the reference's dimension-unaware `det(H) < htol`).
- The (dr_i/dx_j)^T x_bar_i products the reference assembles column-by-
  column with SpatialPerturbationSurrogate per unit vector
  (rollout.jl:173-186) and the (dr_i/dy_j) value-channel terms of
  solve_dual_y (rollout.jl:126-148) -> ONE `jax.vjp` per constraint
  against the refactorized posterior (models/perturbation.py documents
  the jvp/vjp <-> perturbation-surrogate equivalence). The vjp yields
  the *transpose* products directly — no d unit-vector solves.
- gather_g / gather_q (rollout.jl:193-231) -> the x0-row and theta
  cotangents of the same vjp.

Deviation notes (intended-semantics fixes, kept consistent with the
autodiff route):
- The reference's solve_dual_y perturbs with a *random* direction
  (`dx = rand(dim)`, rollout.jl:133) and evaluates the observable
  gradient at `optimal_index` rather than the perturbed step
  (rollout.jl:141) — artifacts of the stale refactor (SURVEY §0). The
  clean adjoint folds each fantasy value channel dy_i = grad_y_i . dx_i
  exactly.
- Sample-path semantics: a fantasy observation y_j is an evaluation of a
  fixed GP sample path, so dy_j/dx_j = the drawn gradient rows and the
  draw carries no derivative w.r.t. the conditioning state — the
  reference observable coupling (observables.jl:106-124, tex:167-171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models import fantasy as fant
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.ops import chol as chol_ops
from rollout_bo_tpu.ops import kernels as kern
from rollout_bo_tpu.ops import small_chol
from rollout_bo_tpu.rollout.trajectory import TrajectoryRecord, base_fmini

__all__ = ["gradient_adjoint"]


def _refactor_view(fs: fant.FantasyState, X, y, n) -> sg.SurrogateState:
    """Differentiable posterior view at active count n from raw (X, y).

    The adjoint needs d(grad alpha)/d(fantasy covariates/values); a full
    masked refactorization (like the perturbation surrogates' refit,
    reference rbs.jl:652-694) makes those derivatives exact under vjp.
    """
    K = kern.eval_KXX(fs.kernel, X, noise=fs.noise)
    L = chol_ops.masked_cholesky(K, n)
    Li = chol_ops.tri_inv_padded(L)
    m = (jnp.arange(X.shape[0]) < n).astype(X.dtype)
    c = chol_ops.psd_apply(Li, y * m)
    return sg.SurrogateState(fs.kernel, X, y, L, c, n, fs.noise, Li)


def _constraint_dual(H, rhs, *, htol: float):
    """lam = -H^{-T} rhs with the reference's singularity guard.

    reference solve_dual_x's final triangular solve (rollout.jl:188) and
    `det(H) < htol -> 0` guard (rollout.jl:159-161), replaced by the same
    Cholesky PD-margin test the forward IFT uses (trajectory.py): at a
    proper interior maximum -H is PD; otherwise the dual is zeroed.
    """
    d = H.shape[0]
    A = -0.5 * (H + H.T)  # symmetrize; H is an exact Hessian up to roundoff
    s = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(A))), 1e-300)
    eye = jnp.eye(d, dtype=H.dtype)
    L_test = small_chol.chol_small(A - htol * s * eye)
    ok = jnp.all(jnp.isfinite(L_test))
    A_safe = jnp.where(ok, A, eye)
    lam = small_chol.spd_solve_small(A_safe, rhs)  # -H^{-T} rhs = A^{-1} rhs
    return jnp.where(ok, lam, 0.0), ok


def gradient_adjoint(
    fs: fant.FantasyState,
    rec: TrajectoryRecord,
    rule: DecisionRule,
    theta,
    *,
    htol: float = 1e-4,
):
    """(grad_x0, grad_theta) of one trajectory's reward, by back-substitution.

    fs: the FantasyState AFTER the rollout (all h+1 fantasies conditioned;
    its X/y rows n_base..n_base+h hold the trajectory).
    rec: the TrajectoryRecord (xs, ys, drawn grads) from rollout_core.

    reference: gradient(T) (rollout.jl:233-277). Returns the gradient of
    reward = max(fmini - min_j y_j, 0) w.r.t. the start point x0 and the
    decision-rule hyperparameters theta, under sample-path draw semantics.
    """
    dt = fs.X.dtype
    h = rec.xs.shape[0] - 1  # horizon (static)
    d = rec.xs.shape[1]
    theta = jnp.asarray(theta, dt)
    p = theta.shape[0]

    fmini = base_fmini(fs)
    t = jnp.argmin(rec.ys)
    improved = fmini > jnp.min(rec.ys)

    # --- case 2 result (best at step 0): exact -grad y_0 (rollout.jl:249)
    case2_gx = -rec.grads[0]

    # --- case 3: reverse sweep over the implicit constraints j = h..1.
    # Cotangent accumulators for the x_j / y_j nodes; reward = fmini - y_t
    # seeds ybar[t] = -1. Steps beyond t contribute nothing (their duals
    # are masked out), reproducing the reference's optimal_index cutoff.
    xbar = jnp.zeros((h + 1, d), dt)
    ybar = jnp.zeros((h + 1,), dt).at[t].set(-1.0)
    theta_bar = jnp.zeros((p,), dt)

    rows_all = jnp.arange(fs.capacity)

    for j in range(h, 0, -1):  # static unroll; h is small (<= 3 in practice)
        active = (jnp.asarray(j) <= t) & improved

        # fold the y_j -> x_j sample-path channel (dy_j = grad_y_j . dx_j)
        xc = xbar[j] + rec.grads[j] * ybar[j]

        # Hessian of the j-th inner solve's acquisition at its argmax,
        # on the posterior conditioned through fantasy j-1
        # (recover_policy_solve, rollout.jl:114-124)
        st_j = fant.view(fs, j - 1)
        _, _, H = sg.acquisition_value_grad_hess(st_j, rule, rec.xs[j], theta)
        lam, _ = _constraint_dual(H, xc, htol=htol)
        lam = jnp.where(active, lam, 0.0)

        # Distribute lam through the constraint r_j = grad alpha_j = 0 to
        # every upstream input: fantasy rows 0..j-1 (covariate + value
        # channels) and theta. ONE vjp replaces the reference's d
        # SpatialPerturbation solves per (i, j) pair plus the
        # DataPerturbation value terms plus gather_q's mixed partials.
        frows = fs.n_base + jnp.arange(j)          # row slots of fantasies 0..j-1

        def r_j(rows, yvals, th, _j=j, _frows=frows):
            sel = rows_all[:, None] == _frows[None, :]           # (cap, j)
            X = jnp.where(
                jnp.any(sel, axis=1)[:, None],
                (sel.astype(dt) @ rows), fs.X,
            )
            y = jnp.where(jnp.any(sel, axis=1), sel.astype(dt) @ yvals, fs.y)
            st = _refactor_view(fs, X, y, fs.n_base + _j)
            _, g = sg.acquisition_grad(st, rule, rec.xs[_j], th)
            return g

        rows0 = jnp.take(fs.X, frows, axis=0)
        yvals0 = jnp.take(fs.y, frows)
        _, vjp_fn = jax.vjp(r_j, rows0, yvals0, theta)
        rbar, ybar_contrib, thbar = vjp_fn(lam)

        # fantasy i corresponds to trajectory step i (x_0 first)
        xbar = xbar.at[:j].add(rbar)
        ybar = ybar.at[:j].add(ybar_contrib)
        theta_bar = theta_bar + thbar

    # x_0 node: covariate cotangent + its sample-path value channel
    case3_gx = xbar[0] + rec.grads[0] * ybar[0]

    gx = jnp.where(
        improved,
        jnp.where(t == 0, case2_gx, case3_gx),
        jnp.zeros((d,), dt),
    )
    gth = jnp.where(improved & (t > 0), theta_bar, jnp.zeros((p,), dt))
    return gx, gth

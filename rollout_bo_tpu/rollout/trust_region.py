"""Trust-region Newton solvers (jittable, fixed-iteration).

Re-design of the reference's dormant trust-region layer
(`/root/reference/optim.jl`): `solve_tr` (:9-51, Gander/Golub/Von Matt
eigen-based TR subproblem incl. the hard case), `tr_newton` (:68-114) and
`tr_SR1` (:127-185). The live reference path uses Optim.IPNewton instead
(as does this engine's inner solver, rollout/solvers.py); these are
provided for API/algorithm parity and as an alternative inner solver.

All loops are fixed-length lax structures: the TR radius-update loop is a
lax.scan with masked acceptance, and the subproblem's Lagrange multiplier
is found by bisection with a fixed iteration count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["solve_tr", "tr_newton", "tr_sr1"]


def solve_tr(g, H, delta, *, bisect_iters: int = 40):
    """min_p g.p + 1/2 p.H.p  s.t. ||p|| <= delta (exact, via eigh).

    Returns (p, hit_boundary). reference: optim.jl:9-51.
    """
    d = g.shape[0]
    w, V = jnp.linalg.eigh(H)
    gt = V.T @ g

    def p_of(lam):
        return -(gt / (w + lam))

    # interior solution if H is PD and ||p(0)|| <= delta
    lam_min = w[0]
    p0 = p_of(0.0)
    interior_ok = (lam_min > 0.0) & (jnp.linalg.norm(p0) <= delta)

    # otherwise bisection on lam in (max(0, -lam_min), hi]
    lo = jnp.maximum(0.0, -lam_min) + 1e-12
    gnorm = jnp.linalg.norm(g)
    hi = lo + gnorm / jnp.maximum(delta, 1e-12) + jnp.abs(w).max() + 1.0

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        too_long = jnp.linalg.norm(p_of(mid)) > delta
        return jnp.where(too_long, mid, lo), jnp.where(too_long, hi, mid)

    lo_f, hi_f = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi))
    lam = 0.5 * (lo_f + hi_f)
    p_boundary = p_of(lam)
    nb = jnp.linalg.norm(p_boundary)
    # Hard case (optim.jl:41-47): g is (numerically) orthogonal to the
    # lowest eigendirection, so ||p(lam)|| stays below delta for every
    # lam > -lam_min and the bisection collapses to lam ~ -lam_min without
    # reaching the boundary. Gander/Golub/Von Matt: take the min-norm
    # limit solution at lam* = -lam_min — a pseudo-inverse over the
    # non-degenerate eigendirections (coordinates in the lam_min eigenspace
    # are zeroed, like the reference we "punt" on multiplicity > 1 and use
    # only the first) — then add tau along the e1 COORDINATE of the
    # eigenbasis so that ||p|| = delta.
    lam_star = -lam_min
    denom = w + lam_star  # first entry == 0 by construction
    scale = jnp.maximum(jnp.abs(w).max(), 1.0)
    safe = jnp.where(jnp.abs(denom) > 1e-10 * scale, denom, jnp.inf)
    p_min_norm = -(gt / safe)
    tau = jnp.sqrt(jnp.maximum(delta**2 - jnp.sum(p_min_norm**2), 0.0))
    e1 = jnp.zeros(d, dtype=g.dtype).at[0].set(1.0)
    p_hard = p_min_norm + tau * e1
    hard = nb < 0.99 * delta  # bisection failed to reach the boundary
    p_boundary = jnp.where(hard, p_hard, p_boundary)

    p = jnp.where(interior_ok, p0, p_boundary)
    return V @ p, ~interior_ok


def tr_newton(value_grad_hess, x0, *, delta0=1.0, delta_max=10.0,
              iterations: int = 30, eta=0.1, lbs=None, ubs=None):
    """Trust-region Newton minimization (reference tr_newton, optim.jl:68-114).

    value_grad_hess(x) -> (f, g, H). Box bounds are enforced by clipping.
    Returns (x, f, converged_mask_ignored).
    """

    def step(carry, _):
        x, delta, fcur = carry
        f, g, H = value_grad_hess(x)
        p, _ = solve_tr(g, H, delta)
        xn = x + p
        if lbs is not None:
            xn = jnp.clip(xn, jnp.asarray(lbs, x.dtype), jnp.asarray(ubs, x.dtype))
        fn, _, _ = value_grad_hess(xn)
        pred = -(jnp.dot(g, p) + 0.5 * jnp.dot(p, H @ p))
        rho = (f - fn) / jnp.maximum(pred, 1e-300)
        shrink = rho < 0.25
        grow = (rho > 0.75) & (jnp.linalg.norm(p) > 0.9 * delta)
        delta = jnp.where(shrink, 0.25 * delta,
                          jnp.where(grow, jnp.minimum(2.0 * delta, delta_max), delta))
        accept = (rho > eta) & jnp.isfinite(fn)
        x = jnp.where(accept, xn, x)
        f_out = jnp.where(accept, fn, f)
        return (x, delta, f_out), None

    f0, _, _ = value_grad_hess(x0)
    (x, _, f), _ = jax.lax.scan(step, (x0, jnp.asarray(delta0, x0.dtype), f0),
                                None, length=iterations)
    return x, f


def tr_sr1(value_grad, x0, *, delta0=1.0, iterations: int = 40, eta=1e-4,
           lbs=None, ubs=None):
    """SR1 quasi-Newton trust-region minimization (optim.jl:127-185).

    value_grad(x) -> (f, g); the Hessian is a symmetric-rank-1 estimate.
    """
    d = x0.shape[0]

    def step(carry, _):
        x, B, delta, fcur, gcur = carry
        p, _ = solve_tr(gcur, B, delta)
        xn = x + p
        if lbs is not None:
            xn = jnp.clip(xn, jnp.asarray(lbs, x.dtype), jnp.asarray(ubs, x.dtype))
            p = xn - x
        fn, gn = value_grad(xn)
        yk = gn - gcur
        pred = -(jnp.dot(gcur, p) + 0.5 * jnp.dot(p, B @ p))
        rho = (fcur - fn) / jnp.maximum(pred, 1e-300)
        # SR1 update with the standard safeguard
        r = yk - B @ p
        denom = jnp.dot(r, p)
        ok = jnp.abs(denom) > 1e-8 * jnp.linalg.norm(r) * jnp.linalg.norm(p)
        B = jnp.where(ok, B + jnp.outer(r, r) / jnp.where(ok, denom, 1.0), B)
        delta = jnp.where(rho < 0.25, 0.25 * delta,
                          jnp.where(rho > 0.75, 2.0 * delta, delta))
        accept = (rho > eta) & jnp.isfinite(fn)
        x = jnp.where(accept, xn, x)
        f_out = jnp.where(accept, fn, fcur)
        g_out = jnp.where(accept, gn, gcur)
        return (x, B, delta, f_out, g_out), None

    f0, g0 = value_grad(x0)
    init = (x0, jnp.eye(d, dtype=x0.dtype), jnp.asarray(delta0, x0.dtype), f0, g0)
    (x, _, _, f, _), _ = jax.lax.scan(step, init, None, length=iterations)
    return x, f

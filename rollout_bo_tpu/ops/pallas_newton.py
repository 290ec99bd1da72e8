"""Pallas TPU kernel: batched multistart projected-Newton acquisition solve.

The rollout hot loop (SURVEY §3.2) solves, at every fantasy step of every
Monte-Carlo trajectory of every outer restart, a multistart Newton
maximization of the acquisition on a tiny GP (capacity ~24, d ~10). That
is ~16k independent solves per rollout step, each made of tiny matrix
algebra — far below MXU tile sizes, so the XLA lowering spends most of its
time in layout copies and under-filled vector ops (profiled: the batched
(8,200,10,10,10) Hessian-assembly fusions plus pure layout `copy`s
dominate device time).

This kernel runs the ENTIRE multistart Newton solve — posterior + EI
derivatives, active-set reduction, Gershgorin-damped Newton direction via
unrolled lane-vectorized Cholesky, two-direction backtracking, start
argmax — in one Pallas program with the *lane* (= flattened trajectory x
restart) axis as the vector dimension:

- every per-lane array is laid out (..., LANE_BLOCK) so each scalar of
  the solve is a full (128,) VPU vector across lanes;
- the per-lane GP state (X^T, K^{-1}, c) stays resident in VMEM across
  all starts x iterations — it is read from HBM exactly once;
- there is no MXU work at all: K^{-1} is precomputed outside (one real
  batched matmul), and everything inside is elementwise + small
  reductions, which is exactly what the VPU is for.

Only the FORWARD solve lives here: the caller (rollout/trajectory.py
argmax_with_ift) differentiates through the implicit-function-theorem
linearization, never through the solver, so no custom VJP is needed.

Semantics mirror `rollout/solvers.py::newton_solve_batch` line by line
(reference: the serial Optim.IPNewton multistart of rbf_optim.jl:68-134).
Equivalence is pinned by tests/test_pallas_newton.py (interpret mode) and
the on-TPU A/B in scripts/ab_pallas_solver.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "SUPPORTED_KINDS",
    "SUPPORTED_RULES",
    "newton_solve_lanes",
    "supported",
]

LANE_BLOCK = 128
_BACKTRACK_STEPS = 9          # must match solvers._BACKTRACK_STEPS
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327
_Z_CLAMP = 30.0               # must match decision_rules._Z_CLAMP
_EPS = 1e-14                  # must match ops.kernels._EPS

SUPPORTED_KINDS = ("matern52", "matern32", "matern12",
                   "squared_exponential", "periodic")
SUPPORTED_RULES = ("EI", "POI", "LCB", "LogEI", "LogPOI")


def supported(kind: str, rule_name: str) -> bool:
    return kind in SUPPORTED_KINDS and rule_name in SUPPORTED_RULES


# --------------------------------------------------------------------------
# Radial profiles: psi(rho), a(rho) = psi'(rho)/rho, b(rho) = (psi''-a)/rho^2
# (the factored stationary-Hessian coefficients of ops.kernels
# .hess_contraction), hand-derived per family so no autodiff runs inside
# the kernel. `iso` is a at rho>0 and psi''(0) at rho=0 (kernels.py:199).
# --------------------------------------------------------------------------


def _profile_terms(kind: str, rho, sq, ell, period=None):
    """Return (psi, a, b, iso) elementwise for rho = sqrt(sq) >= 0."""
    pos = rho > _EPS
    if kind == "periodic":
        # psi = exp(-2 sin^2(w rho) / ell^2), w = pi / period
        # (ops/kernels.py::_psi_periodic; reference rbf.jl:98-103)
        c1 = 2.0 / (ell * ell)
        w = jnp.pi / period
        u = w * rho
        psi = jnp.exp(-c1 * jnp.sin(u) ** 2)
        s2u = jnp.sin(2.0 * u)
        dpsi = -c1 * w * s2u * psi
        d2psi = (-2.0 * c1 * w * w * jnp.cos(2.0 * u)
                 + c1 * c1 * w * w * s2u * s2u) * psi
        safe = jnp.where(pos, rho, 1.0)
        a = jnp.where(pos, dpsi / safe, 0.0)
        b = jnp.where(pos, (d2psi - a) / (safe * safe), 0.0)
        iso = jnp.where(pos, a, -2.0 * c1 * w * w)   # psi''(0)
        return psi, a, b, iso
    if kind == "matern52":
        c = jnp.sqrt(5.0) / ell
        s = c * rho
        e = jnp.exp(-s)
        psi = (1.0 + s * (1.0 + s / 3.0)) * e
        a_pos = -(c * c / 3.0) * (1.0 + s) * e
        a = a_pos                              # smooth through 0
        b = (c**4 / 3.0) * e
        iso = a_pos                            # a(0) = psi''(0) = -c^2/3
        return psi, jnp.where(pos, a, 0.0), jnp.where(pos, b, 0.0), iso
    if kind == "matern32":
        c = jnp.sqrt(3.0) / ell
        s = c * rho
        e = jnp.exp(-s)
        psi = (1.0 + s) * e
        a = -c * c * e
        safe = jnp.where(pos, s, 1.0)
        b = jnp.where(pos, c**4 * e / safe, 0.0)
        iso = jnp.where(pos, a, -c * c)        # psi''(0) = -c^2
        return psi, jnp.where(pos, a, 0.0), b, iso
    if kind == "matern12":
        c = 1.0 / ell
        e = jnp.exp(-c * rho)
        psi = e
        safe = jnp.where(pos, rho, 1.0)
        a = jnp.where(pos, -c * e / safe, 0.0)
        # psi' = -c e, psi'' = c^2 e; b = (psi'' - a)/rho^2
        b = jnp.where(pos, (c * c * e - a) / jnp.where(pos, sq, 1.0), 0.0)
        iso = jnp.where(pos, a, c * c)         # psi''(0) = c^2
        return psi, a, b, iso
    if kind == "squared_exponential":
        l2 = ell * ell
        psi = jnp.exp(-sq / (2.0 * l2))
        a = -psi / l2
        b = psi / (l2 * l2)
        iso = a
        return psi, a, b, iso
    raise ValueError(f"unsupported kernel kind {kind!r}")


# --------------------------------------------------------------------------
# Decision-rule value + partials (match models/decision_rules.py exactly:
# jax.grad of the guarded forms gives 0 beyond the z clamp and below the
# sigma tolerance, reproduced here with the same where masks).
# --------------------------------------------------------------------------


def _erf(x):
    """float32 erf — Eigen's generic_fast_erf_float rational approximation
    (the same polynomial XLA lowers jax.lax.erf to for f32), because Mosaic
    has no erf primitive. Max error ~1 ulp over the clamped range.
    """
    x = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    x2 = x * x
    alpha = (-2.72614225801306e-10, 2.77068142495902e-08,
             -2.10102402082508e-06, -5.69250639462346e-05,
             -7.34990630326855e-04, -2.95459980854025e-03,
             -1.60960333262415e-02)
    beta = (-1.45660718464996e-05, -2.13374055278905e-04,
            -1.68282697438203e-03, -7.37332916720468e-03,
            -1.42647390514189e-02)
    num = jnp.full_like(x2, alpha[0])
    for a in alpha[1:]:
        num = num * x2 + a
    num = num * x
    den = jnp.full_like(x2, beta[0])
    for b in beta[1:]:
        den = den * x2 + b
    return num / den


def _norm_cdf(z):
    return 0.5 * (1.0 + _erf(z * _INV_SQRT2))


def _norm_pdf(z):
    return _INV_SQRT2PI * jnp.exp(-0.5 * z * z)


# --------------------------------------------------------------------------
# Log-space tail machinery for LogEI / LogPOI. The erf polynomial above
# cancels catastrophically for z < -1 (cdf -> 0), so the tails are built
# from two scalar Mills-ratio corrections in t = 1/|z|:
#
#   c(t) = log(|z| * Phi(z)/phi(z))        (-> 0 as z -> -inf)
#   q(t) = log((1 - |z| * Phi/phi) / t^2)  (so log(1 + z*Mills) = 2 log t + q)
#
# Both are evaluated by a degree-12 Chebyshev-derived polynomial on
# t in (0.1, 1] (max abs err ~3e-7 / 1.6e-6 in f32 Horner) and by the
# divergent-but-accurate asymptotic series below t = 0.1 (err < 1e-6).
# Fit script recorded in the round-4 build log; reference values from
# scipy.special.log_ndtr in float64.
# --------------------------------------------------------------------------

_HALF_LOG_2PI = 0.9189385332046727

_C_COEF = (
    7.357126067616959e-05, -0.003030332555429463, -0.9460333971085013,
    -0.5452875891075231, 5.917213284650515, -13.330680039626309,
    16.136072259524276, -9.091448506887286, -3.269217078293205,
    10.285783857545367, -8.302420084484648, 3.252465210828019,
    -0.5255742944808028,
)
_Q_COEF = (
    0.0003553685708074239, -0.015378764422016716, -2.7095052943101523,
    -3.149139485836574, 31.99608533256913, -93.6622237838578,
    170.23164452827305, -214.17068623084106, 190.2244261160476,
    -117.22290850693899, 47.60922667911587, -11.413227140771019,
    1.2151486419508726,
)


def _poly(t, coef):
    acc = jnp.full_like(t, coef[-1])
    for cf in coef[-2::-1]:
        acc = acc * t + cf
    return acc


def _expm1s(x):
    """exp(x) - 1 without a dedicated primitive: series for small |x|."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 0.0, x)
    return jnp.where(small, x * (1.0 + 0.5 * x), jnp.exp(xs) - 1.0)


def _log1ps(x):
    """log(1 + x) without a dedicated primitive: series for small |x|.

    f32 `log(1 + x)` loses ~half the digits of x below 1e-3 (1 + x rounds
    at eps), which is exactly the regime the mills corrections live in —
    the second-order tail partials are differences of these tiny numbers
    and inherit the error amplified by 1/t^2.
    """
    small = jnp.abs(x) < 1e-3
    xs = jnp.where(small, 0.0, x)
    return jnp.where(small, x * (1.0 - 0.5 * x), jnp.log(1.0 + xs))


def _mills_c(t):
    t2 = t * t
    series = _log1ps(t2 * (-1.0 + t2 * (3.0 + t2 * (-15.0 + t2 * 105.0))))
    return jnp.where(t > 0.1, _poly(t, _C_COEF), series)


def _mills_q(t):
    t2 = t * t
    series = _log1ps(t2 * (-3.0 + t2 * (15.0 + t2 * (-105.0 + t2 * 945.0))))
    return jnp.where(t > 0.1, _poly(t, _Q_COEF), series)


def _log_ndtr_neg(z):
    """log Phi(z) for z <= -1 (asymptotic + Mills correction)."""
    nz = jnp.maximum(-z, 1.0)
    t = 1.0 / nz
    return -0.5 * z * z - jnp.log(nz) - _HALF_LOG_2PI + _mills_c(t)


def _inv_mills(z):
    """r(z) = phi(z)/Phi(z) = d/dz log Phi, stable for all z."""
    direct = _norm_pdf(z) / jnp.maximum(_norm_cdf(z), 1e-30)
    nz = jnp.maximum(-z, 1.0)
    tail = nz * jnp.exp(-_mills_c(1.0 / nz))
    return jnp.where(z >= -1.0, direct, tail)


def _rule_value(rule: str, mu, sigma, th, fmini, sigma_tol):
    if rule == "LCB":
        return th * sigma - mu
    s = jnp.maximum(sigma, sigma_tol)
    imp = fmini - mu - th
    if rule in ("EI", "POI"):
        z = jnp.clip(imp / s, -_Z_CLAMP, _Z_CLAMP)
        if rule == "EI":
            val = imp * _norm_cdf(z) + s * _norm_pdf(z)
        else:  # POI
            val = _norm_cdf(z)
        return jnp.where(sigma < sigma_tol, 0.0, val)
    z = imp / s  # log rules are unclamped (decision_rules.py)
    if rule == "LogPOI":
        direct = jnp.log(jnp.maximum(_norm_cdf(z), 1e-30))
        val = jnp.where(z >= -1.0, direct, _log_ndtr_neg(z))
        # guard below any representable candidate (decision_rules._logpoi)
        return jnp.where(sigma < sigma_tol, -0.25 * 3.4028235e38, val)
    # LogEI (decision_rules._logei): log s + log g(z), g = z Phi + phi
    zs = jnp.maximum(z, -1.0)
    g_direct = zs * _norm_cdf(zs) + _norm_pdf(zs)
    direct = jnp.log(jnp.maximum(g_direct, 1.1754944e-38))
    nz = jnp.maximum(-z, 1.0)
    t = 1.0 / nz
    log_phi = -0.5 * z * z - _HALF_LOG_2PI
    tail = log_phi + 2.0 * jnp.log(t) + _mills_q(t)
    return jnp.log(s) + jnp.where(z >= -1.0, direct, tail)


def _rule_partials(rule: str, mu, sigma, th, fmini, sigma_tol):
    """(gmu, gsig, gmumu, gsigsig, gmusig) with the guard masks of
    jax.grad through models.decision_rules._ei/_poi/_lcb."""
    if rule in ("LogEI", "LogPOI"):
        return _log_rule_partials(rule, mu, sigma, th, fmini, sigma_tol)
    one = jnp.ones_like(mu)
    zero = jnp.zeros_like(mu)
    if rule == "LCB":
        return -one, th * one, zero, zero, zero
    s = jnp.maximum(sigma, sigma_tol)
    imp = fmini - mu - th
    zraw = imp / s
    z = jnp.clip(zraw, -_Z_CLAMP, _Z_CLAMP)
    # inside the clamp the clip is identity; outside, d z/d mu = 0 so all
    # z-chains die (matching jax.grad of jnp.clip)
    live = (jnp.abs(zraw) < _Z_CLAMP).astype(mu.dtype)
    # below sigma_tol, s is constant in sigma (jnp.maximum subgradient)
    dsig = (sigma > sigma_tol).astype(mu.dtype)
    phi = _norm_pdf(z)
    if rule == "EI":
        # inside the clamp: d val/dmu = -Phi(z); outside, z is the clamped
        # constant c and d[imp*Phi(c)+s*phi(c)]/dmu = -Phi(c) -- same form
        gmu = -_norm_cdf(z)
        # d val/ds = phi(z) both inside and outside the clamp
        gsig = phi * dsig
        gmumu = live * phi / s
        gsigsig = live * z * z * phi / s * dsig * dsig
        gmusig = live * z * phi / s * dsig
    else:  # POI
        gmu = -live * phi / s
        gsig = -live * z * phi / s * dsig
        gmumu = -live * z * phi / (s * s)
        gsigsig = live * z * (2.0 - z * z) * phi / (s * s) * dsig * dsig
        gmusig = live * (1.0 - z * z) * phi / (s * s) * dsig
    guard = (sigma >= sigma_tol).astype(mu.dtype)
    return (gmu * guard, gsig * guard, gmumu * guard, gsigsig * guard,
            gmusig * guard)


def _log_rule_partials(rule: str, mu, sigma, th, fmini, sigma_tol):
    """(gmu, gsig, gmumu, gsigsig, gmusig) for LogEI / LogPOI.

    Hand-derived chain rule through z = (fmini - mu - th)/s with
    s = max(sigma, sigma_tol); s-chains die below sigma_tol (dsig mask),
    matching jax.grad of decision_rules._logei/_logpoi. The large-|z|
    cancellations (r' = -zr - r^2 and u' = w - u^2 are differences of
    ~z^2 quantities) are factored through expm1 so every branch is
    f32-stable at any z the rollout can produce.
    """
    s = jnp.maximum(sigma, sigma_tol)
    dsig = (sigma > sigma_tol).astype(mu.dtype)
    z = (fmini - mu - th) / s
    s2 = s * s
    if rule == "LogPOI":
        r = _inv_mills(z)
        # r' = -z r - r^2 = r * z * expm1(-c) in the tail (no cancellation)
        nz = jnp.maximum(-z, 1.0)
        c = _mills_c(1.0 / nz)
        rp_tail = r * z * _expm1s(-c)
        rp = jnp.where(z >= -1.0, -z * r - r * r, rp_tail)
        gmu = -r / s
        gsig = -z * r / s * dsig
        gmumu = rp / s2
        gsigsig = (2.0 * z * r + z * z * rp) / s2 * dsig * dsig
        gmusig = (z * rp + r) / s2 * dsig
        guard = (sigma >= sigma_tol).astype(mu.dtype)
        return (gmu * guard, gsig * guard, gmumu * guard, gsigsig * guard,
                gmusig * guard)
    # LogEI: F = log s + log g, g = z Phi + phi, u = Phi/g, w = phi/g,
    # u' = w - u^2. No sigma guard branch (the value is finite there and
    # only the s-chains freeze).
    zs = jnp.maximum(z, -1.0)
    g_direct = jnp.maximum(zs * _norm_cdf(zs) + _norm_pdf(zs), 1e-30)
    u_direct = _norm_cdf(zs) / g_direct
    w_direct = _norm_pdf(zs) / g_direct
    up_direct = w_direct - u_direct * u_direct
    nz = jnp.maximum(-z, 1.0)
    t = 1.0 / nz
    c = _mills_c(t)
    q = _mills_q(t)
    inv_t2_emq = jnp.exp(-q) / (t * t)         # w in the tail
    u_tail = jnp.exp(c - q) / t                # u = exp(c - q)/t
    up_tail = -inv_t2_emq * _expm1s(2.0 * c - q)  # w - u^2, factored
    direct = z >= -1.0
    u = jnp.where(direct, u_direct, u_tail)
    up = jnp.where(direct, up_direct, up_tail)
    gmu = -u / s
    gsig = (1.0 - z * u) / s * dsig
    gmumu = up / s2
    gsigsig = (2.0 * z * u + z * z * up - 1.0) / s2 * dsig * dsig
    gmusig = (z * up + u) / s2 * dsig
    return (gmu, gsig, gmumu, gsigsig, gmusig)


# --------------------------------------------------------------------------
# Lane-vectorized small linear algebra: every "scalar" is a (B,) vector.
# --------------------------------------------------------------------------


def _chol_solve_lanes(A, g, d: int):
    """Solve A p = g for SPD A (d, d, B); NaN lanes when not PD.

    Unrolled Cholesky + both substitutions (ops/small_chol.py pattern)
    with lanes as the trailing vector axis.
    """
    L = [[None] * d for _ in range(d)]
    for j in range(d):
        s = A[j, j] - sum((L[j][k] * L[j][k] for k in range(j)), start=0.0)
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, d):
            t = A[i, j] - sum((L[i][k] * L[j][k] for k in range(j)), start=0.0)
            L[i][j] = t * inv
    z = [None] * d
    for i in range(d):
        acc = g[i] - sum((L[i][k] * z[k] for k in range(i)), start=0.0)
        z[i] = acc / L[i][i]
    p = [None] * d
    for i in reversed(range(d)):
        acc = z[i] - sum((L[k][i] * p[k] for k in range(i + 1, d)), start=0.0)
        p[i] = acc / L[i][i]
    return jnp.stack(p, axis=0)  # (d, B)


# --------------------------------------------------------------------------
# The kernel
# --------------------------------------------------------------------------


def _posterior_mu_sigma(x, Xt, W, c, mask, kind, ell, k0, sigma_floor, period):
    """(mu, sigma) at x (d, B); all per-lane arrays lane-last."""
    R = x[:, None, :] - Xt                      # (d, cap, B)
    sq = jnp.sum(R * R, axis=0)                 # (cap, B)
    rho = jnp.sqrt(jnp.maximum(sq, 0.0))
    psi, _, _, _ = _profile_terms(kind, rho, sq, ell, period)
    kx = psi * mask
    w = jnp.sum(W * kx[None, :, :], axis=1)     # (cap, B)
    mu = jnp.sum(kx * c, axis=0)                # (B,)
    var = jnp.maximum(k0 - jnp.sum(kx * w, axis=0), sigma_floor**2)
    return mu, jnp.sqrt(var)


def _posterior_full(x, Xt, W, c, mask, kind, ell, k0, sigma_floor, period):
    """mu, grad_mu, hess_mu, sigma, grad_sigma, hess_sigma (lane-last).

    Mirrors models/surrogate.py::posterior with W = K^{-1} replacing the
    two triangular applications of Li.
    """
    d = x.shape[0]
    R = x[:, None, :] - Xt                      # (d, cap, B)
    sq = jnp.sum(R * R, axis=0)                 # (cap, B)
    rho = jnp.sqrt(jnp.maximum(sq, 0.0))
    psi, a, b, iso = _profile_terms(kind, rho, sq, ell, period)
    kx = psi * mask                             # (cap, B)
    gkx = a[None, :, :] * R * mask[None, :, :]  # (d, cap, B)

    mu = jnp.sum(kx * c, axis=0)                # (B,)
    grad_mu = jnp.sum(gkx * c[None, :, :], axis=1)  # (d, B)

    w = jnp.sum(W * kx[None, :, :], axis=1)     # (cap, B)
    var = jnp.maximum(k0 - jnp.sum(kx * w, axis=0), sigma_floor**2)
    sigma = jnp.sqrt(var)
    ssafe = jnp.maximum(sigma, sigma_floor)
    grad_sigma = -jnp.sum(gkx * w[None, :, :], axis=1) / ssafe  # (d, B)

    # hess_mu = (c . iso) I + R^T diag(c*b) R   (factored contraction)
    cm = c * mask
    iso_c = jnp.sum(cm * jnp.where(rho > _EPS, a, iso), axis=0)  # (B,)
    cb = cm * b                                  # (cap, B)
    # hess_sigma needs Dw = K^{-1} gkx^T: (cap, d, B) via d column solves
    rows_hm = []
    rows_hs = []
    wm = w * mask
    iso_w = jnp.sum(wm * jnp.where(rho > _EPS, a, iso), axis=0)
    wb = wm * b
    Dw = [jnp.sum(W * gkx[k][None, :, :], axis=1) for k in range(d)]  # d x (cap, B)
    eye_np = jnp.eye(d, dtype=x.dtype)  # static; avoids scatter-add (Mosaic)
    for i in range(d):
        hm_i = jnp.sum(R * (R[i] * cb)[None, :, :], axis=1)          # (d, B)
        hm_i = hm_i + eye_np[i][:, None] * iso_c[None, :]
        rows_hm.append(hm_i)
        gDw_i = jnp.stack(
            [jnp.sum(gkx[i] * Dw[kk], axis=0) for kk in range(d)], axis=0
        )                                                            # (d, B)
        hw_i = jnp.sum(R * (R[i] * wb)[None, :, :], axis=1)          # (d, B)
        hs_i = (
            -grad_sigma[i][None, :] * grad_sigma
            - gDw_i
            - hw_i
            - eye_np[i][:, None] * iso_w[None, :]
        )
        rows_hs.append(hs_i)
    hess_mu = jnp.stack(rows_hm, axis=0)        # (d, d, B)
    hess_sigma = jnp.stack(rows_hs, axis=0) / ssafe[None, None, :]
    return mu, grad_mu, hess_mu, sigma, grad_sigma, hess_sigma


def _make_kernel(d: int, cap: int, S: int, iterations: int, kind: str,
                 rule: str, sigma_tol: float, sigma_floor: float,
                 ridge: float, f_tol: float, x_tol: float):
    ts = [0.5**k for k in range(_BACKTRACK_STEPS)]
    neg_inf = float("-inf")
    loose = f_tol > 0.0 or x_tol > 0.0  # IPNewton-style loose acceptance
    # (solvers.newton_solve_batch loose branch; reference rbf_optim.jl:26-30)

    def kernel(params_ref, xstarts_ref, bounds_ref,
               Xt_ref, W_ref, c_ref, fmini_ref, nn_ref, th_ref,
               xout_ref, vout_ref):
        ell = params_ref[0, 0]
        k0 = params_ref[0, 1]
        period = params_ref[0, 2]
        Xt = Xt_ref[:]                          # (d, cap, B)
        W = W_ref[:]                            # (cap, cap, B)
        c = c_ref[:]                            # (cap, B)
        fmini = fmini_ref[0, :]                 # (B,)
        nn = nn_ref[0, :]                       # (B,) float active count
        th = th_ref[0, :]                       # (B,) rule theta[0]
        dt = c.dtype
        B = c.shape[-1]
        lbs = [bounds_ref[0, i] for i in range(d)]
        ubs = [bounds_ref[1, i] for i in range(d)]
        scale = bounds_ref[2, 0]
        boundary_tol = 1e-9 * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (cap, B), 0).astype(dt)
        mask = (rows < nn[None, :]).astype(dt)
        lbs_v = jnp.stack([jnp.full((B,), lbs[i], dt) for i in range(d)])
        ubs_v = jnp.stack([jnp.full((B,), ubs[i], dt) for i in range(d)])

        def value(x):
            mu, sigma = _posterior_mu_sigma(
                x, Xt, W, c, mask, kind, ell, k0, sigma_floor, period)
            return _rule_value(rule, mu, sigma, th, fmini, sigma_tol)

        def one_iteration(_, x):
            mu, gmu_v, Hmu, sigma, gsig_v, Hsig = _posterior_full(
                x, Xt, W, c, mask, kind, ell, k0, sigma_floor, period)
            a0 = _rule_value(rule, mu, sigma, th, fmini, sigma_tol)
            gmu, gsig, gmumu, gsigsig, gmusig = _rule_partials(
                rule, mu, sigma, th, fmini, sigma_tol)
            g = gmu[None, :] * gmu_v + gsig[None, :] * gsig_v     # (d, B)
            H = (
                gmumu[None, None, :] * gmu_v[:, None, :] * gmu_v[None, :, :]
                + gmu[None, None, :] * Hmu
                + gsigsig[None, None, :] * gsig_v[:, None, :] * gsig_v[None, :, :]
                + gsig[None, None, :] * Hsig
                + gmusig[None, None, :] * (
                    gmu_v[:, None, :] * gsig_v[None, :, :]
                    + gsig_v[:, None, :] * gmu_v[None, :, :]
                )
            )                                                      # (d, d, B)

            # active-set reduction (solvers.py one_iteration)
            act_lo = (x <= lbs_v + boundary_tol) & (g < 0.0)
            act_hi = (x >= ubs_v - boundary_tol) & (g > 0.0)
            free = (~(act_lo | act_hi)).astype(x.dtype)            # (d, B)
            gf = g * free
            eye3 = jnp.eye(d, dtype=dt)[:, :, None]
            Hf = (H * free[:, None, :] * free[None, :, :]
                  - eye3 * (1.0 - free)[:, None, :])

            # Gershgorin-damped Newton direction (_clipped_newton_direction)
            A = -Hf
            diag = jnp.stack([A[i, i] for i in range(d)])          # (d, B)
            s_scale = jnp.maximum(jnp.max(jnp.abs(diag), axis=0), ridge)
            absA = jnp.abs(A)
            off = jnp.sum(absA, axis=1) - jnp.abs(diag)            # (d, B)
            tau_g = jnp.maximum(jnp.max(off - diag, axis=0), 0.0) \
                + ridge + 1e-6 * s_scale                           # (B,)

            def solve_tau(tau):
                At = A + tau[None, None, :] * jnp.eye(d, dtype=x.dtype)[:, :, None]
                p = _chol_solve_lanes(At, gf, d)
                ok = jnp.all(jnp.isfinite(p), axis=0) & (
                    jnp.sum(p * gf, axis=0) > 0.0)
                return p, ok

            p1, ok1 = solve_tau(jnp.full((B,), ridge, dt))
            p2, ok2 = solve_tau(tau_g)
            p = jnp.where(ok1[None, :], p1,
                          jnp.where(ok2[None, :], p2, gf / s_scale[None, :]))
            p = p * free

            bad = (~jnp.all(jnp.isfinite(p), axis=0)) | (
                jnp.sum(p * gf, axis=0) <= 0.0)
            gnorm = jnp.sqrt(jnp.sum(gf * gf, axis=0))
            gstep = gf / jnp.maximum(gnorm, 1e-12)[None, :] * (0.1 * scale)
            p = jnp.where(bad[None, :], gstep, p)
            pnorm = jnp.sqrt(jnp.sum(p * p, axis=0))
            p = p * jnp.minimum(1.0, scale / jnp.maximum(pnorm, 1e-30))[None, :]

            a0 = jnp.where(jnp.isfinite(a0), a0, neg_inf)
            best_v = a0
            best_x = x
            improved = jnp.zeros((B,), bool)
            for direction in (p, gstep):
                for t in ts:
                    cand = jnp.clip(x + t * direction, lbs_v, ubs_v)
                    v = value(cand)
                    v = jnp.where(jnp.isfinite(v), v, neg_inf)
                    upd = v > best_v
                    best_v = jnp.where(upd, v, best_v)
                    best_x = jnp.where(upd[None, :], cand, best_x)
                    improved = improved | upd
            return jnp.where(improved[None, :], best_x, x), a0, best_v

        def iter_body(_, x):
            xn, _, _ = one_iteration(None, x)
            return xn

        def iter_body_loose(_, carry):
            # lane freezes once its relative value improvement or step norm
            # drops below tolerance (solvers.py loose branch). Frozen lanes
            # keep recomputing the same point — lock-step SPMD, identical
            # results to the per-lane early exit. The mask is carried in
            # the value dtype, not bool: Mosaic fails to legalize an i1
            # vector as an scf.for carry on real chips (measured round 5,
            # results/logs/r5_loose_gramacylee_h3.log), while interpret
            # mode accepts it.
            x, frozen_f = carry
            frozen = frozen_f > 0.5
            xn_cand, a0, vbest = one_iteration(None, x)
            improvement = jnp.maximum(vbest - a0, 0.0)
            small_f = improvement <= f_tol * (jnp.abs(a0) + f_tol)
            dx = xn_cand - x
            small_x = jnp.sqrt(jnp.sum(dx * dx, axis=0)) <= x_tol
            xn = jnp.where(frozen[None, :], x, xn_cand)
            new_frozen = frozen | small_f | small_x
            return xn, jnp.where(new_frozen, jnp.asarray(1.0, dt),
                                 jnp.asarray(0.0, dt))

        def one_start(s_idx, carry):
            best_v, best_x = carry
            x0 = jnp.stack([
                jnp.clip(jnp.full((B,), xstarts_ref[s_idx, i], dt),
                         lbs[i], ubs[i])
                for i in range(d)
            ])                                                     # (d, B)
            if loose:
                xf, _ = jax.lax.fori_loop(
                    0, iterations, iter_body_loose,
                    (x0, jnp.zeros((B,), dt)))
            else:
                xf = jax.lax.fori_loop(0, iterations, iter_body, x0)
            vf = value(xf)
            vf = jnp.where(jnp.isfinite(vf), vf, neg_inf)
            upd = vf > best_v
            best_v = jnp.where(upd, vf, best_v)
            best_x = jnp.where(upd[None, :], xf, best_x)
            return best_v, best_x

        best_v, best_x = jax.lax.fori_loop(
            0, S, one_start,
            (jnp.full((B,), neg_inf, dt), jnp.zeros((d, B), dt)))
        xout_ref[:] = best_x
        vout_ref[0, :] = best_v

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kind", "rule", "iterations", "sigma_tol",
                     "sigma_floor", "ridge", "f_tol", "x_tol", "interpret"),
)
def newton_solve_lanes(
    X,            # (L, cap, d)
    W,            # (L, cap, cap)  K^{-1} per lane (identity-padded ok)
    c,            # (L, cap)
    n,            # (L,) int32 active counts
    fmini,        # (L,) incumbent minimum per lane
    theta0,       # (L,) rule theta[0] per lane
    ell,          # () kernel lengthscale
    lbs,          # (d,)
    ubs,          # (d,)
    xstarts,      # (S, d)
    period=1.0,   # () periodic-kernel period (ignored by other kinds)
    *,
    kind: str = "matern52",
    rule: str = "EI",
    iterations: int = 12,
    sigma_tol: float = 1e-8,
    sigma_floor: float = 1e-10,
    ridge: float = 1e-8,
    f_tol: float = 0.0,
    x_tol: float = 0.0,
    interpret: bool = False,
):
    """Multistart Newton argmax per lane. Returns (xstar (L, d), v (L,)).

    Lane dtype follows `X.dtype` — float32 (the TPU rollout dtype) or
    float64 (the POI/parity configuration; the erf/Mills polynomials are
    f32-grade, ~1e-6 abs error, which the loose f_tol=1e-3 acceptance that
    the f64 configs use renders immaterial). `W` must be K^{-1} of the
    active block with identity padding (padded rows/cols contribute
    nothing because kx is masked). `f_tol`/`x_tol` > 0 enable the
    IPNewton-style loose per-lane freeze (solvers.newton_solve_batch).
    """
    L, cap, d = X.shape
    S = xstarts.shape[0]
    ldt = jnp.float64 if X.dtype == jnp.float64 else jnp.float32
    Lp = ((L + LANE_BLOCK - 1) // LANE_BLOCK) * LANE_BLOCK

    def pad(a, axis=0):
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, Lp - L)
        return jnp.pad(a, widths)

    Xt = pad(jnp.transpose(X.astype(ldt), (2, 1, 0)), axis=2)       # (d, cap, Lp)
    Wt = pad(jnp.transpose(W.astype(ldt), (1, 2, 0)), axis=2)       # (cap, cap, Lp)
    ct = pad(jnp.transpose(c.astype(ldt), (1, 0)), axis=1)          # (cap, Lp)
    fm = pad(fmini.astype(ldt)[None, :], axis=1)                    # (1, Lp)
    nn = pad(n.astype(ldt)[None, :], axis=1)                        # (1, Lp)
    th = pad(theta0.astype(ldt)[None, :], axis=1)                   # (1, Lp)

    lbs = jnp.asarray(lbs, ldt)
    ubs = jnp.asarray(ubs, ldt)
    scale = jnp.max(ubs - lbs)
    bounds = jnp.zeros((3, d), ldt).at[0].set(lbs).at[1].set(ubs)
    bounds = bounds.at[2, 0].set(scale)
    k0 = _profile_terms(kind, jnp.zeros((), ldt), jnp.zeros((), ldt),
                        jnp.asarray(ell, ldt), jnp.asarray(period, ldt))[0]
    params = jnp.stack([jnp.asarray(ell, ldt), k0,
                        jnp.asarray(period, ldt)])[None, :]         # (1, 3)

    kernel = _make_kernel(d, cap, S, iterations, kind, rule,
                          sigma_tol, sigma_floor, ridge, f_tol, x_tol)
    grid = (Lp // LANE_BLOCK,)
    B = LANE_BLOCK

    lane_spec = lambda *blk: pl.BlockSpec(
        blk, (lambda i, nb=len(blk): tuple([0] * (nb - 1)) + (i,)),
        memory_space=pltpu.VMEM)

    xout, vout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, d), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, d), lambda i: (0, 0), memory_space=pltpu.SMEM),
            lane_spec(d, cap, B),
            lane_spec(cap, cap, B),
            lane_spec(cap, B),
            lane_spec(1, B),
            lane_spec(1, B),
            lane_spec(1, B),
        ],
        out_specs=[
            lane_spec(d, B),
            lane_spec(1, B),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, Lp), ldt),
            jax.ShapeDtypeStruct((1, Lp), ldt),
        ],
        interpret=interpret,
    )(params, jnp.asarray(xstarts, ldt), bounds, Xt, Wt, ct, fm, nn, th)

    return jnp.transpose(xout, (1, 0))[:L], vout[0, :L]


# --------------------------------------------------------------------------
# vmap-composable entry point
#
# The rollout engine reaches the solver through nested vmaps (restarts x MC
# lanes) around a lax.scan. pallas_call's default batching rule would add
# one grid instance per lane — catastrophic for 128-lane-vectorized blocks.
# Instead `get_solver` returns a custom_vmap function whose batching rule
# collapses every vmap axis into the kernel's flat lane dimension; the rule
# re-enters the same custom_vmap function, so arbitrarily nested vmaps all
# flatten into one big pallas_call.
# --------------------------------------------------------------------------


_LANE_ARGS = 6  # X, Li, c, n, fmini, theta0 carry the lane dimension


def _broadcast_unbatched(axis_size, args, batched):
    out = []
    for a, b in zip(args, batched):
        if b:
            out.append(a)
        else:
            out.append(jnp.broadcast_to(a[None], (axis_size,) + a.shape))
    return out


@functools.lru_cache(maxsize=None)
def get_solver(kind: str, rule: str, iterations: int, interpret: bool = False,
               f_tol: float = 0.0, x_tol: float = 0.0):
    """(X, Li, c, n, fmini, theta0, ell, lbs, ubs, xstarts) -> (xstar, v).

    Single-lane signature — X (cap, d), Li (cap, cap), c (cap,), scalars n
    / fmini / theta0 — composable under any nesting of jax.vmap. `Li` is
    the maintained explicit Cholesky inverse; K^{-1} = Li^T Li is formed
    once per flattened call as a real batched MXU matmul. `f_tol`/`x_tol`
    enable the per-lane IPNewton-style loose freeze (DecisionRule
    .solve_f_tol, reference rbf_optim.jl:26-30).
    """

    def flat_impl(X, Li, c, n, fmini, theta0, ell, lbs, ubs, xstarts,
                  period):
        W = jnp.einsum("lji,ljk->lik", Li, Li)
        return newton_solve_lanes(
            X, W, c, n, fmini, theta0, ell, lbs, ubs, xstarts, period,
            kind=kind, rule=rule, iterations=iterations,
            f_tol=f_tol, x_tol=x_tol, interpret=interpret,
        )

    solve_flat = jax.custom_batching.custom_vmap(flat_impl)

    @solve_flat.def_vmap
    def _flat_rule(axis_size, in_batched, X, Li, c, n, fmini, theta0,
                   ell, lbs, ubs, xstarts, period):
        lane = _broadcast_unbatched(
            axis_size, (X, Li, c, n, fmini, theta0), in_batched[:_LANE_ARGS])
        if any(in_batched[_LANE_ARGS:]):
            raise NotImplementedError(
                "pallas solver: ell/lbs/ubs/xstarts/period must be shared "
                "across the vmapped axis")
        L = lane[0].shape[1]
        flat = [a.reshape((axis_size * L,) + a.shape[2:]) for a in lane]
        xs, vs = solve_flat(*flat, ell, lbs, ubs, xstarts, period)
        return (
            (xs.reshape(axis_size, L, xs.shape[-1]),
             vs.reshape(axis_size, L)),
            (True, True),
        )

    def one_impl(X, Li, c, n, fmini, theta0, ell, lbs, ubs, xstarts,
                 period):
        xs, vs = solve_flat(
            X[None], Li[None], c[None], n[None], fmini[None], theta0[None],
            ell, lbs, ubs, xstarts, period)
        return xs[0], vs[0]

    solve_one = jax.custom_batching.custom_vmap(one_impl)

    @solve_one.def_vmap
    def _one_rule(axis_size, in_batched, X, Li, c, n, fmini, theta0,
                  ell, lbs, ubs, xstarts, period):
        lane = _broadcast_unbatched(
            axis_size, (X, Li, c, n, fmini, theta0), in_batched[:_LANE_ARGS])
        if any(in_batched[_LANE_ARGS:]):
            raise NotImplementedError(
                "pallas solver: ell/lbs/ubs/xstarts/period must be shared "
                "across the vmapped axis")
        xs, vs = solve_flat(*lane, ell, lbs, ubs, xstarts, period)
        return (xs, vs), (True, True)

    return solve_one

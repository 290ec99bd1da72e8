"""Base acquisition decision rules g(mu, sigma, theta, fmini) and partials.

TPU-native re-design of `/root/reference/decision_rules.jl`: each rule is a
pure scalar function; every partial the reference derives with ForwardDiff
(decision_rules.jl:23-34) is derived here with `jax.grad` at trace time.
Rules are static (hashable) objects closed over by jitted computations.

All rules are *maximized* by the inner solver. sigma guards are expressed
as NaN-free `jnp.where` pairs so gradients stay finite at sigma -> 0
(reference guards: decision_rules.jl:88-90, 104-106).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

__all__ = ["DecisionRule", "EI", "LogEI", "POI", "LogPOI", "LCB",
           "RandomAcquisition", "RULES"]


# |z| beyond this is saturated: cdf/pdf tails are < 1e-190, and the clamp
# keeps the higher-order autodiff chains finite in float32 on functions
# with huge unnormalized ranges (e.g. trid10d where |f| ~ 1e5)
_Z_CLAMP = 30.0


def _ei(mu, sigma, theta, fmini, sigma_tol):
    # reference: decision_rules.jl:84-99
    s = jnp.maximum(sigma, sigma_tol)
    improvement = fmini - mu - theta[0]
    z = jnp.clip(improvement / s, -_Z_CLAMP, _Z_CLAMP)
    val = improvement * norm.cdf(z) + s * norm.pdf(z)
    return jnp.where(sigma < sigma_tol, 0.0, val)


def _poi(mu, sigma, theta, fmini, sigma_tol):
    # reference: decision_rules.jl:101-115
    s = jnp.maximum(sigma, sigma_tol)
    z = jnp.clip((fmini - mu - theta[0]) / s, -_Z_CLAMP, _Z_CLAMP)
    return jnp.where(sigma < sigma_tol, 0.0, norm.cdf(z))


def _lcb(mu, sigma, theta, fmini, sigma_tol):
    # maximization form of the lower confidence bound:
    # reference decision_rules.jl:117-127
    return theta[0] * sigma - mu


def _random(mu, sigma, theta, fmini, sigma_tol):
    # reference: decision_rules.jl:129-135 (dispatched by name in the solver)
    return jnp.zeros_like(mu)


def _logei(mu, sigma, theta, fmini, sigma_tol):
    """Numerically stable log(EI) (LogEI; Ament et al. 2023).

    Same argmax as EI but well-conditioned where EI underflows — the
    far-from-incumbent plateaus that defeat f32 EI on TPU (the reference's
    stale runtests.jl:89-118 checks logEI derivative variants; its live
    rules never gained one). log g(z) with g(z) = z*Phi(z) + phi(z):
    direct for moderate z; for z << 0 via the Mills-ratio form
    log phi(z) + log1p(z * Phi(z)/phi(z)), all terms in log space.
    """
    from jax.scipy.special import log_ndtr

    s = jnp.maximum(sigma, sigma_tol)
    z = (fmini - mu - theta[0]) / s
    # z >= -1: direct (g(z) >= g(-1) ~ 0.083, no cancellation)
    zsafe = jnp.maximum(z, -1.0)
    g_direct = zsafe * norm.cdf(zsafe) + norm.pdf(zsafe)
    direct = jnp.log(jnp.maximum(g_direct, jnp.finfo(s.dtype).tiny))
    # z < -1: log phi + log1p(z * mills), mills = Phi/phi in log space
    zneg = jnp.minimum(z, -1.0)
    log_phi_neg = -0.5 * zneg**2 - 0.5 * jnp.log(2.0 * jnp.pi)
    zmills = zneg * jnp.exp(log_ndtr(zneg) - log_phi_neg)  # in (-1, 0)
    # dtype-aware floor: the old -1 + 1e-15 IS -1.0 in float32 (1e-15 is
    # below f32 eps), so once z < ~-100 the rounded zmills hit the floor
    # and log1p(-1) = -inf poisoned the whole fallback solve surface.
    # With -1 + eps the tail caps at log(eps): the capped VALUE is off by
    # a few units on a ~ -z^2/2 scale and the gradient keeps its dominant
    # -z term (the frozen mills term contributes only ~2/|z|), so the
    # f32 solve surface stays finite, smooth, and correctly oriented.
    # (The Pallas kernel's LogEI tail is exact in this regime —
    # ops/pallas_newton.py _mills_q.)
    floor = -1.0 + jnp.finfo(jnp.asarray(z).dtype).eps
    tail = log_phi_neg + jnp.log1p(jnp.maximum(zmills, floor))
    log_g = jnp.where(z >= -1.0, direct, tail)
    # sigma < sigma_tol needs no separate branch: s == sigma_tol there, so
    # log(s) + log_g is already the floored value
    return jnp.log(s) + log_g


def _logpoi(mu, sigma, theta, fmini, sigma_tol):
    """Numerically stable log(POI) = log Phi(z); same argmax as POI.

    POI's Phi(z) underflows to an EXACT f32 zero for z < -12 (and the
    z-clamp flattens it beyond |z| = 30 in any dtype), stranding the
    Newton solver on gradient-free plateaus — the reference never sees
    this because its Julia POI runs in float64 where Phi keeps usable
    tails to z ~ -37 (decision_rules.jl:101-115). log_ndtr is finite with
    a well-scaled gradient (d/dz log Phi ~ |z|) everywhere. The
    sigma < sigma_tol guard maps POI's hard 0 (its minimum) to a large
    negative constant so already-observed points can never win the
    argmax, matching the guard's intent.
    """
    from jax.scipy.special import log_ndtr

    s = jnp.maximum(sigma, sigma_tol)
    z = (fmini - mu - theta[0]) / s
    # Guard constant: must sit BELOW every achievable non-guard value, or
    # an already-observed point (sigma < sigma_tol) could win the argmax —
    # the opposite of the guard's intent. log_ndtr(z) ~ -z^2/2, and z is
    # unbounded on huge-range surfaces (|f| ~ 1e5 with sigma near
    # sigma_tol gives z ~ -1e13, log_ndtr ~ -5e25, far under any fixed
    # -1e6-style constant), so the guard is a quarter of the dtype's most
    # negative finite value: the ordering can only break if z^2 overflows
    # the dtype (|z| > 1.3e19 in f32, 9e153 in f64 — beyond any
    # representable surface), and the quarter leaves headroom for a
    # downstream subtraction (cost-aware log composition) without
    # overflowing to -inf.
    guard = -0.25 * jnp.finfo(jnp.asarray(s).dtype).max
    return jnp.where(sigma < sigma_tol, guard, log_ndtr(z))


_RULE_FNS = {"EI": _ei, "POI": _poi, "LCB": _lcb, "Random": _random,
             "LogEI": _logei, "LogPOI": _logpoi}


@dataclasses.dataclass(frozen=True)
class DecisionRule:
    """A named acquisition rule; static/hashable, safe to close over in jit.

    Mirrors the reference `DecisionRule` struct (decision_rules.jl:4-34);
    the 8 stored partial closures become `jax.grad` calls.

    `solve_f_tol` / `solve_x_tol` request IPNewton-style LOOSE acceptance
    from the inner Newton solver (reference rbf_optim.jl:26-30:
    Optim.Options(x_tol=1e-3, f_tol=1e-3)): a start freezes once its
    per-iteration relative value improvement or step norm drops below the
    tolerance. 0.0 = run all fixed iterations (exact maximization). POI
    defaults to the reference's 1e-3 because its regret behavior DEPENDS
    on loose maximization: Phi(z) saturates to exactly 1.0 over a wide
    plateau and IPNewton's sloppy stop is the implicit exploration that
    makes POI work at all — exact plateau resolution finds the argmax an
    epsilon-step from the incumbent and the BO loop crawls (measured on
    hartmann6d; see PARITY.md "POI saturation").
    """

    name: str = "EI"
    sigma_tol: float = 1e-8
    solve_f_tol: float = 0.0
    solve_x_tol: float = 0.0

    # -- value ------------------------------------------------------------
    def __call__(self, mu, sigma, theta, fmini):
        return _RULE_FNS[self.name](mu, sigma, theta, fmini, self.sigma_tol)

    # -- first partials (reference decision_rules.jl:24,26,28) ------------
    def dg_dmu(self, mu, sigma, theta, fmini):
        return jax.grad(self.__call__, argnums=0)(mu, sigma, theta, fmini)

    def dg_dsigma(self, mu, sigma, theta, fmini):
        return jax.grad(self.__call__, argnums=1)(mu, sigma, theta, fmini)

    def dg_dtheta(self, mu, sigma, theta, fmini):
        return jax.grad(self.__call__, argnums=2)(mu, sigma, theta, fmini)

    # -- second partials (decision_rules.jl:25,27,29) ----------------------
    def d2g_dmu(self, mu, sigma, theta, fmini):
        return jax.grad(jax.grad(self.__call__, argnums=0), argnums=0)(mu, sigma, theta, fmini)

    def d2g_dsigma(self, mu, sigma, theta, fmini):
        return jax.grad(jax.grad(self.__call__, argnums=1), argnums=1)(mu, sigma, theta, fmini)

    def d2g_dtheta(self, mu, sigma, theta, fmini):
        return jax.hessian(self.__call__, argnums=2)(mu, sigma, theta, fmini)

    # -- mixed partials (decision_rules.jl:30-31 + exact mu/sigma cross) ---
    def d2g_dmudsigma(self, mu, sigma, theta, fmini):
        return jax.grad(jax.grad(self.__call__, argnums=0), argnums=1)(mu, sigma, theta, fmini)

    def d2g_dmudtheta(self, mu, sigma, theta, fmini):
        return jax.jacfwd(jax.grad(self.__call__, argnums=0), argnums=2)(mu, sigma, theta, fmini)

    def d2g_dsigmadtheta(self, mu, sigma, theta, fmini):
        return jax.jacfwd(jax.grad(self.__call__, argnums=1), argnums=2)(mu, sigma, theta, fmini)


def EI(sigma_tol: float = 1e-8) -> DecisionRule:
    return DecisionRule("EI", sigma_tol)


def LogEI(sigma_tol: float = 1e-8) -> DecisionRule:
    return DecisionRule("LogEI", sigma_tol)


def POI(sigma_tol: float = 1e-8, *, solve_f_tol: float = 1e-3,
        solve_x_tol: float = 1e-3) -> DecisionRule:
    return DecisionRule("POI", sigma_tol, solve_f_tol, solve_x_tol)


def LogPOI(sigma_tol: float = 1e-8) -> DecisionRule:
    return DecisionRule("LogPOI", sigma_tol)


def LCB() -> DecisionRule:
    return DecisionRule("LCB")


def RandomAcquisition() -> DecisionRule:
    return DecisionRule("Random")


RULES = {"EI": EI, "LogEI": LogEI, "POI": POI, "LogPOI": LogPOI,
         "LCB": LCB, "Random": RandomAcquisition}

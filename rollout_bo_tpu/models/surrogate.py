"""GP (RBF) surrogate as a fixed-capacity pytree with pure-functional updates.

TPU-native re-design of the reference surrogate layer
(`/root/reference/radial_basis_surrogates.jl:30-317,770-829`):

- The reference's preallocated capacity-sized buffers with an "active
  count" (rbs.jl:77-118) map directly onto XLA static shapes: buffers are
  (capacity, ...) arrays, `n` is a traced scalar, and the Cholesky factor
  keeps an identity-padding invariant (see ops/chol.py).
- `condition!` (rbs.jl:214-222) becomes the pure `condition(state, x, y)`
  (rank-1 Schur append + coefficient re-solve).
- The LazyStruct posterior DAG (rbs.jl:224-310) becomes the plain function
  `posterior(state, x)` returning every posterior quantity; under jit, XLA
  dead-code-eliminates whatever the caller does not use — lazy evaluation
  by compiler instead of by Dict.
- MLE (rbs.jl:770-829) uses the same closed-form log-likelihood with
  `jax.grad` through the masked Cholesky.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.ops import chol as chol_ops
from rollout_bo_tpu.ops import kernels as kern
from rollout_bo_tpu.ops import small_chol
from rollout_bo_tpu.ops.kernels import RBFKernel

__all__ = [
    "SurrogateState",
    "Posterior",
    "fit",
    "refit",
    "condition",
    "reset",
    "set_kernel",
    "get_active_minimum",
    "posterior",
    "joint_posterior_chol",
    "gp_draw",
    "gp_draw_joint",
    "acquisition",
    "acquisition_grad",
    "acquisition_value_grad_hess",
    "log_likelihood",
    "dlog_likelihood",
    "grad_log_likelihood",
    "lazy_posterior",
    "optimize_hypers",
    "DEFAULT_CAPACITY",
]

DEFAULT_CAPACITY = 100  # reference: constants.jl:13


class SurrogateState(NamedTuple):
    """Fixed-capacity GP state (reference Surrogate struct, rbs.jl:30-41).

    X: (cap, d) covariates, rows >= n are zeros.
    y: (cap,)  observations, zero-padded.
    L: (cap, cap) lower Cholesky of K_active + noise*I, identity-padded.
    c: (cap,)  K^{-1} y coefficients, zero-padded.
    n: ()      active observation count (traced int32).
    noise: ()  observation noise sigma_n^2.
    Li: (cap, cap) explicit L^{-1}, identity-padded — kept alongside L so
        posterior solves are MXU matmuls (see ops/chol.py tri_inv_padded).
    """

    kernel: RBFKernel
    X: jax.Array
    y: jax.Array
    L: jax.Array
    c: jax.Array
    n: jax.Array
    noise: jax.Array
    Li: jax.Array

    @property
    def capacity(self) -> int:
        return self.X.shape[0]

    @property
    def dim(self) -> int:
        return self.X.shape[1]

    @property
    def mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.n


def _refactor(kernel: RBFKernel, X, y, n, noise):
    """Full (masked) refactorization: K -> L, L^{-1} -> c."""
    K = kern.eval_KXX(kernel, X, noise=noise)
    L = chol_ops.masked_cholesky(K, n)
    Li = chol_ops.tri_inv_padded(L)
    m = (jnp.arange(X.shape[0]) < n).astype(X.dtype)
    c = chol_ops.psd_apply(Li, y * m)
    return L, Li, c


def fit(
    kernel: RBFKernel,
    X,
    y,
    *,
    capacity: int = DEFAULT_CAPACITY,
    noise: float = 1e-6,
    dtype=None,
) -> SurrogateState:
    """Build a surrogate from (N, d) data, padding to `capacity`.

    reference: Surrogate constructor (rbs.jl:77-118).
    """
    X = jnp.asarray(X, dtype=dtype)
    y = jnp.asarray(y, dtype=X.dtype)
    nobs, d = X.shape
    if nobs > capacity:
        raise ValueError("capacity must be >= number of observations")
    Xp = jnp.zeros((capacity, d), X.dtype).at[:nobs].set(X)
    yp = jnp.zeros((capacity,), X.dtype).at[:nobs].set(y)
    n = jnp.asarray(nobs, jnp.int32)
    noise = jnp.asarray(noise, X.dtype)
    kernel = RBFKernel(theta=jnp.asarray(kernel.theta, X.dtype), kind=kernel.kind)
    L, Li, c = _refactor(kernel, Xp, yp, n, noise)
    return SurrogateState(kernel, Xp, yp, L, c, n, noise, Li)


def refit(state: SurrogateState) -> SurrogateState:
    """Re-factorize in place (same data); used after hyperparameter moves."""
    L, Li, c = _refactor(state.kernel, state.X, state.y, state.n, state.noise)
    return state._replace(L=L, Li=Li, c=c)


def set_kernel(state: SurrogateState, kernel: RBFKernel) -> SurrogateState:
    """Swap the kernel and refactorize (reference set_kernel!, rbs.jl:123-135)."""
    return refit(state._replace(kernel=kernel))


def reset(state: SurrogateState, X, y) -> SurrogateState:
    """Re-fit on new data reusing the same buffers (reference reset!, rbs.jl:147-164)."""
    X = jnp.asarray(X, state.X.dtype)
    y = jnp.asarray(y, state.y.dtype)
    nobs = X.shape[0]
    Xp = jnp.zeros_like(state.X).at[:nobs].set(X)
    yp = jnp.zeros_like(state.y).at[:nobs].set(y)
    n = jnp.asarray(nobs, jnp.int32)
    L, Li, c = _refactor(state.kernel, Xp, yp, n, state.noise)
    return SurrogateState(state.kernel, Xp, yp, L, c, n, state.noise, Li)


def condition(state: SurrogateState, xnew, ynew) -> SurrogateState:
    """Rank-1 conditioning on one new observation (pure).

    reference: condition! = insert! + update_covariance! + update_cholesky!
    + update_coefficients! (rbs.jl:166-222). The caller is responsible for
    capacity (no dynamic resize under jit; see `fit` for capacity choice).
    """
    n = state.n
    cap = state.capacity
    dt = state.X.dtype
    xnew = jnp.asarray(xnew, dt)
    ynew = jnp.asarray(ynew, dt)

    kvec = kern.eval_KxX(state.kernel, xnew, state.X)  # (cap,)
    k0 = state.kernel.psi(jnp.zeros((), dt)) + state.noise
    L, Li = chol_ops.chol_append_row_with_inv(state.L, state.Li, kvec, k0, n)

    rows = jnp.arange(cap)
    X = jnp.where((rows == n)[:, None], xnew[None, :], state.X)
    y = jnp.where(rows == n, ynew, state.y)
    m = (rows < n + 1).astype(dt)
    c = chol_ops.psd_apply(Li, y * m)
    return state._replace(X=X, y=y, L=L, Li=Li, c=c, n=n + 1)


def get_active_minimum(state: SurrogateState) -> jax.Array:
    """min over active observations (the EI incumbent f_mini)."""
    big = jnp.asarray(jnp.finfo(state.y.dtype).max, state.y.dtype)
    return jnp.min(jnp.where(state.mask, state.y, big))


# --------------------------------------------------------------------------
# Posterior evaluation — the LazyStruct DAG as one pure function
# --------------------------------------------------------------------------


class Posterior(NamedTuple):
    """Posterior quantities at a point (reference rbs.jl:224-310 `sx`)."""

    mu: jax.Array        # posterior mean
    grad_mu: jax.Array   # (d,)
    hess_mu: jax.Array   # (d, d)
    sigma: jax.Array     # posterior std
    grad_sigma: jax.Array
    hess_sigma: jax.Array
    kx: jax.Array        # (cap,) masked covariance vector
    grad_kx: jax.Array   # (cap, d) masked
    w: jax.Array         # K^{-1} kx (cap,)


_SIGMA_FLOOR = 1e-10


def posterior(state: SurrogateState, x) -> Posterior:
    """All posterior quantities at x; rely on XLA DCE for laziness."""
    dt = state.X.dtype
    x = jnp.asarray(x, dt)
    m = state.mask.astype(dt)

    kx = kern.eval_KxX(state.kernel, x, state.X) * m
    gkx = kern.eval_grad_KxX(state.kernel, x, state.X) * m[:, None]  # (cap, d)

    mu = jnp.dot(kx, state.c)
    grad_mu = gkx.T @ state.c
    # factored stationary-kernel Hessian contraction (no (cap, d, d) tensor)
    hess_mu = kern.hess_contraction(state.kernel, x, state.X, state.c * m)

    v = state.Li @ kx
    w = state.Li.T @ v
    Dw = chol_ops.psd_apply(state.Li, gkx)  # (cap, d)
    k0 = state.kernel.psi(jnp.zeros((), dt))
    var = jnp.maximum(k0 - jnp.dot(v, v), _SIGMA_FLOOR**2)
    sigma = jnp.sqrt(var)
    ssafe = jnp.maximum(sigma, _SIGMA_FLOOR)
    grad_sigma = -(gkx.T @ w) / ssafe
    hess_sigma = (
        -jnp.outer(grad_sigma, grad_sigma)
        - gkx.T @ Dw
        - kern.hess_contraction(state.kernel, x, state.X, w * m)
    ) / ssafe

    return Posterior(mu, grad_mu, hess_mu, sigma, grad_sigma, hess_sigma, kx, gkx, w)


def joint_posterior_cov(state: SurrogateState, x):
    """Joint (f, grad f) predictive mean and covariance (pre-Cholesky).

    reference `sx.dσ` inputs (rbs.jl:261-267, 530-539). Returns
    (dmu (d+1,), S (d+1, d+1)) with symmetrization + dtype-aware jitter.
    """
    dt = state.X.dtype
    x = jnp.asarray(x, dt)
    m = state.mask.astype(dt)
    kx = kern.eval_KxX(state.kernel, x, state.X) * m
    gkx = kern.eval_grad_KxX(state.kernel, x, state.X) * m[:, None]
    kxX = jnp.concatenate([kx[None, :], gkx.T], axis=0)  # (d+1, cap)
    kxx = kern.kernel_joint_block(state.kernel, jnp.zeros((state.dim,), dt))
    A = state.Li @ kxX.T  # (cap, d+1)
    S = kxx - A.T @ A
    jitter = 1e-10 if dt == jnp.float64 else 1e-6
    S = 0.5 * (S + S.T) + jitter * jnp.eye(state.dim + 1, dtype=dt)
    dmu = jnp.concatenate([jnp.dot(kx, state.c)[None], gkx.T @ state.c])
    return dmu, S


def joint_posterior_chol(state: SurrogateState, x):
    """Cholesky factor of the joint (f, grad f) predictive covariance.

    (d+1, d+1); reference `sx.dσ` (rbs.jl:261-267, 530-539). Also returns
    the joint mean [mu; grad mu]. NOTE: the Cholesky backward is
    numerically fragile for marginally-PD S in float32; the rollout draw
    path differentiates only sqrt(S[0,0]) (see observables) and keeps the
    full factor under stop_gradient.
    """
    dmu, S = joint_posterior_cov(state, x)
    if S.shape[-1] <= small_chol.UNROLL_LIMIT:
        return dmu, small_chol.chol_small(S)
    return dmu, jnp.linalg.cholesky(S)


def gp_draw(state: SurrogateState, x, z):
    """Scalar posterior draw mu + sigma * z (reference gp_draw, rbs.jl:588-611)."""
    p = posterior(state, x)
    return p.mu + p.sigma * z


def gp_draw_joint(state: SurrogateState, x, z):
    """Joint (f, grad f) draw: dmu + chol(joint cov) @ z, z of shape (d+1,)."""
    dmu, Ld = joint_posterior_chol(state, x)
    return dmu + Ld @ z


# --------------------------------------------------------------------------
# Acquisition values/derivatives at a point
# --------------------------------------------------------------------------


_COST_FLOOR = 1e-12


def _rule_cost(rule, x):
    """(mode, c, grad c, hess c) for a cost-aware rule, or None.

    CostAwareRule (models/cost_functions.py) carries an x-dependent
    evaluation-cost model. mode "divide" maximizes alpha(x)/c(x)
    (nonnegative rules: EI/POI); mode "subtract_log" maximizes
    alpha(x) - log c(x) (log-scale rules: LogEI) — dividing a negative
    log value by the cost would invert the cost preference.
    """
    cost = getattr(rule, "cost", None)
    if cost is None:
        return None
    mode = "subtract_log" if rule.name in ("LogEI", "LogPOI") else "divide"
    x = jnp.asarray(x)
    c = jnp.maximum(cost(x), _COST_FLOOR)
    return mode, c, cost.grad(x).astype(x.dtype), cost.hess(x).astype(x.dtype)


def acquisition(state: SurrogateState, rule: DecisionRule, x, theta):
    """alpha(x) = g(mu(x), sigma(x), theta, fmini) (reference sx.αxθ).

    For a CostAwareRule: alpha/c (EI-per-unit-cost) or alpha - log c
    (log-scale rules); see _rule_cost.
    """
    p = posterior(state, x)
    fmini = get_active_minimum(state)
    a = rule(p.mu, p.sigma, theta, fmini)
    cq = _rule_cost(rule, x)
    if cq is not None:
        mode, c, _, _ = cq
        a = a - jnp.log(c) if mode == "subtract_log" else a / c
    return a


def acquisition_grad(state: SurrogateState, rule: DecisionRule, x, theta):
    """(alpha, d alpha/dx) via the chain rule (reference sx.∇αx, rbs.jl:296)."""
    p = posterior(state, x)
    fmini = get_active_minimum(state)
    a = rule(p.mu, p.sigma, theta, fmini)
    gmu = rule.dg_dmu(p.mu, p.sigma, theta, fmini)
    gsig = rule.dg_dsigma(p.mu, p.sigma, theta, fmini)
    grad = gmu * p.grad_mu + gsig * p.grad_sigma
    cq = _rule_cost(rule, x)
    if cq is not None:
        mode, c, gc, _ = cq
        if mode == "subtract_log":  # (a - log c)' = a' - c'/c
            a, grad = a - jnp.log(c), grad - gc / c
        else:  # quotient rule: (a/c)' = a'/c - a c'/c^2
            a, grad = a / c, grad / c - (a / c**2) * gc
    return a, grad


def acquisition_value_grad_hess(state: SurrogateState, rule: DecisionRule, x, theta):
    """(alpha, grad, hess) with the exact Hessian.

    Unlike the reference (rbs.jl:297), we include the d2g/dmu dsigma cross
    term — required for the implicit-function-theorem adjoint to match
    finite differences exactly.
    """
    p = posterior(state, x)
    fmini = get_active_minimum(state)
    args = (p.mu, p.sigma, theta, fmini)
    a = rule(*args)
    gmu = rule.dg_dmu(*args)
    gsig = rule.dg_dsigma(*args)
    gmumu = rule.d2g_dmu(*args)
    gsigsig = rule.d2g_dsigma(*args)
    gmusig = rule.d2g_dmudsigma(*args)
    grad = gmu * p.grad_mu + gsig * p.grad_sigma
    cross = jnp.outer(p.grad_mu, p.grad_sigma)
    hess = (
        gmumu * jnp.outer(p.grad_mu, p.grad_mu)
        + gmu * p.hess_mu
        + gsigsig * jnp.outer(p.grad_sigma, p.grad_sigma)
        + gsig * p.hess_sigma
        + gmusig * (cross + cross.T)
    )
    cq = _rule_cost(rule, x)
    if cq is not None:
        mode, c, gc, Hc = cq
        if mode == "subtract_log":
            # A = a - log c: HA = Ha - Hc/c + grad c grad c^T / c^2
            hess = hess - Hc / c + jnp.outer(gc, gc) / c**2
            a, grad = a - jnp.log(c), grad - gc / c
        else:
            # quotient rule for A = a/c:
            # HA = Ha/c - (grad a grad c^T + grad c grad a^T)/c^2
            #      - a Hc/c^2 + 2 a grad c grad c^T / c^3
            xgc = jnp.outer(grad, gc)
            hess = (hess / c - (xgc + xgc.T) / c**2 - (a / c**2) * Hc
                    + (2.0 * a / c**3) * jnp.outer(gc, gc))
            a, grad = a / c, grad / c - (a / c**2) * gc
    return a, grad, hess


# --------------------------------------------------------------------------
# Hyperparameter MLE (reference rbs.jl:770-829)
# --------------------------------------------------------------------------


def log_likelihood(state: SurrogateState):
    """Closed-form GP log-marginal-likelihood on the active block.

    -y^T c / 2 - sum(log diag L) - n log(2 pi)/2 (rbs.jl:770-776). The
    identity padding contributes log(1) = 0 so no masking is needed on the
    log-det term.
    """
    n = state.n.astype(state.y.dtype)
    return (
        -jnp.dot(state.y * state.mask.astype(state.y.dtype), state.c) / 2.0
        - jnp.sum(jnp.log(jnp.diagonal(state.L)))
        - n * jnp.log(2.0 * jnp.pi) / 2.0
    )


def _ll_of_theta(theta, state: SurrogateState):
    st = refit(state._replace(kernel=state.kernel.replace_theta(theta)))
    return log_likelihood(st)


def grad_log_likelihood(state: SurrogateState):
    """d log-lik / d theta via jax.grad through the masked Cholesky.

    Equals the reference's directional-trace formula (rbs.jl:778-799).
    """
    return jax.grad(_ll_of_theta)(state.kernel.theta, state)


def optimize_hypers(
    state: SurrogateState,
    lowerbounds,
    upperbounds,
    *,
    iterations: int = 60,
    lr: float = 0.1,
) -> SurrogateState:
    """Box-constrained MLE of kernel hyperparameters.

    The reference uses Optim.Fminbox(LBFGS) with 30 iterations
    (rbs.jl:805-829); here: fixed-iteration projected Adam on log(theta)
    (all hypers are positive scales), jit-friendly. Returns the refit state.
    """
    dt = state.X.dtype
    lb = jnp.asarray(lowerbounds, dt)
    ub = jnp.asarray(upperbounds, dt)

    def obj(log_theta):
        return -_ll_of_theta(jnp.exp(log_theta), state)

    g = jax.grad(obj)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def body(i, carry):
        lt, m, v = carry
        gi = g(lt)
        gi = jnp.where(jnp.isfinite(gi), gi, 0.0)
        m = b1 * m + (1 - b1) * gi
        v = b2 * v + (1 - b2) * gi * gi
        t = (i + 1).astype(dt)
        mhat = m / (1 - b1**t)
        vhat = v / (1 - b2**t)
        lt = lt - lr * mhat / (jnp.sqrt(vhat) + eps)
        lt = jnp.clip(lt, jnp.log(lb), jnp.log(ub))
        return lt, m, v

    lt0 = jnp.log(jnp.clip(state.kernel.theta.astype(dt), lb, ub))
    z = jnp.zeros_like(lt0)
    lt, _, _ = jax.lax.fori_loop(0, iterations, body, (lt0, z, z))
    return set_kernel(state, state.kernel.replace_theta(jnp.exp(lt)))


def dlog_likelihood(state: SurrogateState, dtheta):
    """Directional derivative of the log-likelihood along dtheta.

    reference: δlog_likelihood (rbs.jl:778-785), which contracts the
    directional kernel-matrix derivative eval_Dθ_KXX with (cc' - K^{-1});
    here the same scalar is one jvp through refit + log_likelihood.
    """
    dtheta = jnp.asarray(dtheta, state.kernel.theta.dtype)
    _, tangent = jax.jvp(
        lambda th: _ll_of_theta(th, state), (state.kernel.theta,), (dtheta,)
    )
    return tangent


def lazy_posterior(state: SurrogateState, x, rule: DecisionRule | None = None,
                   theta=None):
    """Host-side lazily-forced posterior record (reference `sx`, rbs.jl:224-310).

    Returns a `LazyStruct` whose properties mirror the reference's
    LazyStruct field names: mu, grad_mu ("∇μ"), hess_mu, sigma, grad_sigma,
    hess_sigma, dsigma (joint (f,∇f) predictive Cholesky), and — when a
    decision rule is given — alpha, grad_alpha, hess_alpha. Each thunk
    shares the jitted `posterior` result, so forcing several quantities
    costs one evaluation. For jit/scan code use `posterior()` directly
    (XLA DCE provides the laziness there).
    """
    from rollout_bo_tpu.utils.lazy import LazyStruct

    s = LazyStruct()
    s.p = lambda: posterior(state, x)
    s.mu = lambda: s.p.mu
    s.grad_mu = lambda: s.p.grad_mu
    s.hess_mu = lambda: s.p.hess_mu
    s.sigma = lambda: s.p.sigma
    s.grad_sigma = lambda: s.p.grad_sigma
    s.hess_sigma = lambda: s.p.hess_sigma
    s.dmu_dsigma = lambda: joint_posterior_chol(state, x)
    s.dsigma = lambda: s.dmu_dsigma[1]
    if rule is not None:
        th = jnp.zeros((1,), state.X.dtype) if theta is None else theta
        s.alpha = lambda: acquisition(state, rule, x, th)
        s.grad_alpha = lambda: acquisition_grad(state, rule, x, th)[1]
        s.hess_alpha = lambda: acquisition_value_grad_hess(state, rule, x, th)[2]
    return s


def from_numpy(X: np.ndarray, y: np.ndarray, **kw) -> SurrogateState:
    return fit(kern.matern52(), X, y, **kw)

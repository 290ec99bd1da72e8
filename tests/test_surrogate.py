"""Surrogate posterior / conditioning / MLE checks.

Methodology mirrors reference runtests.jl:89-118 (posterior-quantity
derivative chains mu->grad->hess, sigma, EI) plus incremental-vs-full
factorization equivalence for condition().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import kernels as K

from fd import centered_fd


def make_state(n=9, d=2, cap=16, seed=0, noise=1e-6):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(n, d))
    y = np.sin(X).sum(axis=1) + 0.1 * rng.normal(size=n)
    return sg.fit(K.matern52((0.8,)), X, y, capacity=cap, noise=noise), X, y


def test_fit_matches_dense_solve():
    st, X, y = make_state()
    Kd = np.asarray(K.eval_KXX(K.matern52((0.8,)), jnp.asarray(X), noise=1e-6))
    c = np.linalg.solve(Kd, y)
    np.testing.assert_allclose(np.asarray(st.c)[:9], c, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(st.c)[9:], 0.0)
    # identity padding invariant
    L = np.asarray(st.L)
    np.testing.assert_allclose(L[9:, 9:], np.eye(7), atol=1e-14)


def test_condition_equals_refit():
    st, X, y = make_state()
    xnew = np.array([0.3, -1.1])
    ynew = 0.7
    st2 = sg.condition(st, xnew, ynew)
    full = sg.fit(st.kernel, np.vstack([X, xnew]), np.append(y, ynew), capacity=16, noise=1e-6)
    np.testing.assert_allclose(np.asarray(st2.L), np.asarray(full.L), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st2.c), np.asarray(full.c), rtol=1e-6, atol=1e-10)
    assert int(st2.n) == 10


def test_condition_jits_and_chains():
    st, X, y = make_state()
    cond = jax.jit(sg.condition)
    s = st
    for i in range(3):
        s = cond(s, np.array([0.1 * i, 0.2]), 0.5 * i)
    assert int(s.n) == 12
    # posterior interpolates observations (small noise)
    p = sg.posterior(s, np.array([0.1, 0.2]))
    np.testing.assert_allclose(float(p.mu), 0.5, atol=1e-3)


def test_posterior_interpolates():
    st, X, y = make_state(noise=1e-10)
    for i in range(3):
        p = sg.posterior(st, X[i])
        np.testing.assert_allclose(float(p.mu), y[i], atol=1e-4)
        assert float(p.sigma) < 1e-4


def test_posterior_derivatives_fd():
    st, X, y = make_state()
    x0 = np.array([0.4, 0.6])
    for j in range(2):
        dx = np.zeros(2)
        dx[j] = 1.0
        fd_mu = centered_fd(lambda u: float(sg.posterior(st, jnp.asarray(u)).mu), x0, dx)
        p = sg.posterior(st, x0)
        np.testing.assert_allclose(float(p.grad_mu[j]), fd_mu, rtol=1e-6, atol=1e-9)

        fd_gmu = centered_fd(lambda u: np.asarray(sg.posterior(st, jnp.asarray(u)).grad_mu), x0, dx)
        np.testing.assert_allclose(np.asarray(p.hess_mu)[:, j], fd_gmu, rtol=1e-5, atol=1e-8)

        fd_sig = centered_fd(lambda u: float(sg.posterior(st, jnp.asarray(u)).sigma), x0, dx)
        np.testing.assert_allclose(float(p.grad_sigma[j]), fd_sig, rtol=1e-5, atol=1e-8)

        fd_gsig = centered_fd(lambda u: np.asarray(sg.posterior(st, jnp.asarray(u)).grad_sigma), x0, dx)
        np.testing.assert_allclose(np.asarray(p.hess_sigma)[:, j], fd_gsig, rtol=1e-4, atol=1e-7)


def test_posterior_matches_autodiff():
    st, _, _ = make_state()
    x0 = jnp.asarray([0.25, -0.5])
    g_auto = jax.grad(lambda x: sg.posterior(st, x).mu)(x0)
    np.testing.assert_allclose(np.asarray(sg.posterior(st, x0).grad_mu), np.asarray(g_auto), rtol=1e-9)
    h_auto = jax.hessian(lambda x: sg.posterior(st, x).sigma)(x0)
    np.testing.assert_allclose(np.asarray(sg.posterior(st, x0).hess_sigma), np.asarray(h_auto),
                               rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("rule", [dr.EI(), dr.POI(), dr.LCB()], ids=lambda r: r.name)
def test_acquisition_grad_hess_fd(rule):
    st, _, _ = make_state()
    theta = jnp.asarray([0.01])
    x0 = np.array([0.4, 0.6])
    a, g, H = sg.acquisition_value_grad_hess(st, rule, jnp.asarray(x0), theta)
    assert np.isfinite(float(a))
    for j in range(2):
        dx = np.zeros(2)
        dx[j] = 1.0
        fd_g = centered_fd(lambda u: float(sg.acquisition(st, rule, jnp.asarray(u), theta)), x0, dx)
        np.testing.assert_allclose(float(g[j]), fd_g, rtol=1e-5, atol=1e-9)
        fd_H = centered_fd(
            lambda u: np.asarray(sg.acquisition_grad(st, rule, jnp.asarray(u), theta)[1]), x0, dx)
        np.testing.assert_allclose(np.asarray(H)[:, j], fd_H, rtol=1e-4, atol=1e-7)


def test_joint_posterior_chol_consistency():
    st, _, _ = make_state()
    x0 = jnp.asarray([0.15, 0.35])
    dmu, Ld = sg.joint_posterior_chol(st, x0)
    p = sg.posterior(st, x0)
    np.testing.assert_allclose(float(dmu[0]), float(p.mu), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dmu[1:]), np.asarray(p.grad_mu), rtol=1e-10)
    S = np.asarray(Ld) @ np.asarray(Ld).T
    np.testing.assert_allclose(np.sqrt(S[0, 0]), float(p.sigma), rtol=1e-4, atol=1e-5)


def test_gp_draw_moments():
    st, _, _ = make_state()
    x0 = jnp.asarray([0.9, -0.4])
    p = sg.posterior(st, x0)
    z = np.random.default_rng(5).normal(size=20000)
    ys = np.asarray(jax.vmap(lambda zz: sg.gp_draw(st, x0, zz))(jnp.asarray(z)))
    np.testing.assert_allclose(ys.mean(), float(p.mu), atol=3e-2)
    np.testing.assert_allclose(ys.std(), float(p.sigma), rtol=3e-2)


def test_log_likelihood_and_grad():
    st, X, y = make_state()
    n = len(y)
    Kd = np.asarray(K.eval_KXX(st.kernel, jnp.asarray(X), noise=1e-6))
    sign, logdet = np.linalg.slogdet(Kd)
    ll_ref = -0.5 * y @ np.linalg.solve(Kd, y) - 0.5 * logdet - n / 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(float(sg.log_likelihood(st)), ll_ref, rtol=1e-9)

    g = np.asarray(sg.grad_log_likelihood(st))
    fd = centered_fd(
        lambda t: float(sg.log_likelihood(sg.set_kernel(st, st.kernel.replace_theta(jnp.asarray(t))))),
        np.asarray(st.kernel.theta), np.array([1.0]))
    np.testing.assert_allclose(g[0], fd, rtol=1e-6)


def test_optimize_hypers_improves_ll():
    st, _, _ = make_state(n=12)
    st_bad = sg.set_kernel(st, st.kernel.replace_theta(jnp.asarray([3.0])))
    ll0 = float(sg.log_likelihood(st_bad))
    st_opt = sg.optimize_hypers(st_bad, [0.05], [10.0], iterations=80)
    ll1 = float(sg.log_likelihood(st_opt))
    assert ll1 >= ll0 - 1e-8
    assert 0.05 <= float(st_opt.kernel.theta[0]) <= 10.0


def test_reset_and_active_minimum():
    st, X, y = make_state()
    st2 = sg.reset(st, X[:4], y[:4])
    assert int(st2.n) == 4
    np.testing.assert_allclose(float(sg.get_active_minimum(st2)), y[:4].min())

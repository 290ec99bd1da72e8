"""Perturbation surrogates (vs FD on refit), trust-region solvers, checkpoint.

Perturbation methodology mirrors reference runtests.jl:120-157 (delta-mu,
delta-sigma, delta-grad-EI against finite differences of refit surrogates).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.models import fantasy as fant
from rollout_bo_tpu.models import perturbation as pert
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.rollout import trust_region as tr
from rollout_bo_tpu.utils import checkpoint as ckpt


def base_state(n=6, seed=0, cap=12, d=2):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, size=(n, d))
    y = np.sum(np.sin(2 * X), axis=1)
    return sg.fit(K.matern52((0.6,)), X, y, capacity=cap, noise=1e-6), X, y


def _fantasy_with_points(st, pts, vals):
    fs = fant.make_fantasy(st, horizon=len(pts) - 1)
    for p, v in zip(pts, vals):
        fs = fant.fantasy_condition(fs, jnp.asarray(p), jnp.asarray(v))
    return fs


def test_spatial_perturbation_vs_fd():
    st, X, y = base_state()
    rule = dr.EI()
    theta = jnp.asarray([0.0])
    pts = [np.array([0.2, -0.3]), np.array([-0.4, 0.1])]
    vals = [0.3, -0.2]
    x_eval = jnp.asarray([0.35, 0.45])
    dx = np.array([0.7, -0.2])
    h = 1e-6

    def quantities(shift):
        p0 = pts[1] + shift * dx  # perturb fantasy point 1
        fs = _fantasy_with_points(st, [pts[0], p0], vals)
        v = fant.view(fs, 1)
        p = sg.posterior(v, x_eval)
        fmini = sg.get_active_minimum(v)
        args = (p.mu, p.sigma, theta, fmini)
        ga = rule.dg_dmu(*args) * p.grad_mu + rule.dg_dsigma(*args) * p.grad_sigma
        return np.array([float(p.mu), float(p.sigma)]), np.asarray(ga)

    (mp, gap_), (mm, gam) = quantities(h), quantities(-h)
    fd_mu_sigma = (mp - mm) / (2 * h)
    fd_ga = (gap_ - gam) / (2 * h)

    fs = _fantasy_with_points(st, pts, vals)
    res = pert.spatial_perturbation(fs, 1, rule, x_eval, theta, dx, sample_index=1)
    np.testing.assert_allclose(float(res.d_mu), fd_mu_sigma[0], rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(float(res.d_sigma), fd_mu_sigma[1], rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.d_grad_alpha), fd_ga, rtol=1e-4, atol=1e-8)


def test_data_perturbation_vs_fd():
    st, X, y = base_state()
    rule = dr.EI()
    theta = jnp.asarray([0.0])
    pts = [np.array([0.2, -0.3]), np.array([-0.4, 0.1])]
    vals = [0.3, -0.2]
    grad_y = np.array([0.5, -1.0])  # sample-path gradient at fantasy point 1
    x_eval = jnp.asarray([0.35, 0.45])
    dx = np.array([0.7, -0.2])
    h = 1e-6

    def quantities(shift):
        p1 = pts[1] + shift * dx
        v1 = vals[1] + shift * float(grad_y @ dx)
        fs = _fantasy_with_points(st, [pts[0], p1], [vals[0], v1])
        v = fant.view(fs, 1)
        p = sg.posterior(v, x_eval)
        return np.array([float(p.mu), float(p.sigma)])

    fd = (quantities(h) - quantities(-h)) / (2 * h)
    fs = _fantasy_with_points(st, pts, vals)
    res = pert.data_perturbation(fs, 1, rule, x_eval, theta, dx, grad_y, sample_index=1)
    np.testing.assert_allclose(float(res.d_mu), fd[0], rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(float(res.d_sigma), fd[1], rtol=1e-5, atol=1e-9)


def test_solve_tr_interior_and_boundary():
    H = jnp.asarray(np.diag([2.0, 5.0]))
    g = jnp.asarray([1.0, 1.0])
    p, hit = tr.solve_tr(g, H, 10.0)
    np.testing.assert_allclose(np.asarray(p), [-0.5, -0.2], rtol=1e-8)
    assert not bool(hit)
    p, hit = tr.solve_tr(g, H, 0.1)
    np.testing.assert_allclose(float(jnp.linalg.norm(p)), 0.1, rtol=1e-4)
    assert bool(hit)
    # indefinite H: must still return a boundary step
    Hn = jnp.asarray(np.diag([-1.0, 3.0]))
    p, hit = tr.solve_tr(g, Hn, 0.5)
    assert bool(hit)
    np.testing.assert_allclose(float(jnp.linalg.norm(p)), 0.5, rtol=1e-3)


def test_solve_tr_hard_case():
    # g orthogonal to the lowest eigendirection of an indefinite H: no
    # Lagrange multiplier makes ||p(lam)|| = delta, so the GGvM hard-case
    # step must add tau along the lowest eigendirection (optim.jl:41-47).
    # H = diag(-2, 1), g = (0, 1), delta = 1: min-norm part is
    # p2 = -1/(1 + 2) = -1/3, tau = sqrt(1 - 1/9), and the exact TR
    # optimum value is -1/3 + (-2*(8/9) + 1/9)/2 = -7/6.
    H = jnp.asarray(np.diag([-2.0, 1.0]))
    g = jnp.asarray([0.0, 1.0])
    delta = 1.0
    p, hit = tr.solve_tr(g, H, delta)
    assert bool(hit)
    np.testing.assert_allclose(float(jnp.linalg.norm(p)), delta, rtol=1e-6)
    val = float(g @ p + 0.5 * p @ H @ p)
    np.testing.assert_allclose(val, -7.0 / 6.0, rtol=1e-6)
    # brute-force check: nothing on a dense boundary sample beats it
    ang = np.linspace(0, 2 * np.pi, 5001)
    cand = np.stack([np.cos(ang), np.sin(ang)], axis=1) * delta
    vals = cand @ np.asarray(g) + 0.5 * np.sum(cand * (cand @ np.asarray(H)), axis=1)
    assert val <= vals.min() + 1e-6


def test_tr_newton_minimizes_rosenbrock():
    def vgh(x):
        f = (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2
        g = jax.grad(lambda u: (1 - u[0]) ** 2 + 100 * (u[1] - u[0] ** 2) ** 2)(x)
        H = jax.hessian(lambda u: (1 - u[0]) ** 2 + 100 * (u[1] - u[0] ** 2) ** 2)(x)
        return f, g, H

    x, f = tr.tr_newton(vgh, jnp.asarray([-1.2, 1.0]), iterations=60)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-5)


def test_tr_sr1_minimizes_quadratic():
    A = jnp.asarray(np.diag([1.0, 10.0]))

    def vg(x):
        return 0.5 * x @ A @ x, A @ x

    x, f = tr.tr_sr1(vg, jnp.asarray([3.0, -2.0]), iterations=40)
    np.testing.assert_allclose(np.asarray(x), [0.0, 0.0], atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    st, X, y = base_state()
    p = str(tmp_path / "state")
    ckpt.save_state(p, st)
    st2 = ckpt.load_state(p)
    x = jnp.asarray([0.3, 0.3])
    np.testing.assert_allclose(float(sg.posterior(st, x).mu),
                               float(sg.posterior(st2, x).mu), rtol=1e-12)
    assert st2.kernel.kind == "matern52"

    p2 = str(tmp_path / "bo_ckpt")
    ckpt.save_bo_checkpoint(p2, st, iteration=7, metrics={"gaps": np.arange(3.0)})
    st3, it, mets = ckpt.load_bo_checkpoint(p2)
    assert it == 7
    np.testing.assert_allclose(mets["gaps"], [0, 1, 2])
    np.testing.assert_allclose(np.asarray(st3.y), np.asarray(st.y))

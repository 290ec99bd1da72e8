"""Kernel derivative FD checks (methodology: reference runtests.jl:23-62)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.ops import kernels as K

from fd import centered_fd

FAMILIES = [
    K.matern52(), K.matern32(), K.matern12(), K.squared_exponential(),
    K.periodic(), K.matern52((0.7,)), K.squared_exponential((2.3,)),
]


@pytest.mark.parametrize("k", FAMILIES, ids=lambda k: f"{k.kind}-{float(k.theta[0]):.1f}")
def test_profile_derivatives(k):
    rho = 0.83
    fd = centered_fd(lambda r: k.psi(r[0]), [rho], [1.0])
    np.testing.assert_allclose(float(k.dpsi(jnp.asarray(rho))), fd, rtol=1e-7)
    fd2 = centered_fd(lambda r: k.dpsi(jnp.asarray(r[0])), [rho], [1.0])
    np.testing.assert_allclose(float(k.d2psi(jnp.asarray(rho))), fd2, rtol=1e-6)


@pytest.mark.parametrize("k", FAMILIES[:5], ids=lambda k: k.kind)
def test_theta_gradient(k):
    rho = 0.6
    th = np.asarray(k.theta)
    for j in range(len(th)):
        dth = np.zeros_like(th)
        dth[j] = 1.0
        fd = centered_fd(lambda t: K.RBFKernel(jnp.asarray(t), k.kind).psi(rho), th, dth)
        np.testing.assert_allclose(float(k.dtheta_psi(jnp.asarray(rho))[j]), fd, rtol=1e-6)


@pytest.mark.parametrize("k", FAMILIES[:4], ids=lambda k: k.kind)
def test_kernel_grad_hess(k):
    rng = np.random.default_rng(0)
    r = rng.normal(size=3)
    for j in range(3):
        dr = np.zeros(3)
        dr[j] = 1.0
        fd = centered_fd(lambda u: K.kernel_value(k, jnp.asarray(u)), r, dr)
        np.testing.assert_allclose(float(K.kernel_grad(k, jnp.asarray(r))[j]), fd, rtol=1e-6)
        fdH = centered_fd(lambda u: np.asarray(K.kernel_grad(k, jnp.asarray(u))), r, dr)
        np.testing.assert_allclose(np.asarray(K.kernel_hess(k, jnp.asarray(r)))[:, j], fdH,
                                   rtol=1e-5, atol=1e-8)


def test_grad_zero_at_origin():
    k = K.matern52()
    g = K.kernel_grad(k, jnp.zeros(4))
    assert np.all(np.isfinite(np.asarray(g))) and np.allclose(np.asarray(g), 0.0)
    H = K.kernel_hess(k, jnp.zeros(4))
    # psi''(0) = -5/(3 l^2) for Matern 5/2
    np.testing.assert_allclose(np.asarray(H), -5.0 / 3.0 * np.eye(4), rtol=1e-10)


def test_KXX_symmetry_and_diag():
    k = K.matern32()
    X = np.random.default_rng(1).normal(size=(7, 2))
    Km = np.asarray(K.eval_KXX(k, jnp.asarray(X), noise=1e-6))
    np.testing.assert_allclose(Km, Km.T, atol=1e-14)
    np.testing.assert_allclose(np.diag(Km), 1.0 + 1e-6, rtol=1e-12)
    w = np.linalg.eigvalsh(Km)
    assert w.min() > 0


def test_joint_block_structure():
    k = K.squared_exponential()
    r = jnp.asarray([0.3, -0.2])
    D = np.asarray(K.kernel_joint_block(k, r))
    assert D.shape == (3, 3)
    np.testing.assert_allclose(D[0, 0], float(K.kernel_value(k, r)))
    np.testing.assert_allclose(D[1:, 0], np.asarray(K.kernel_grad(k, r)))
    np.testing.assert_allclose(D[0, 1:], -np.asarray(K.kernel_grad(k, r)))


def test_directional_matrix_derivatives():
    k = K.matern52()
    rng = np.random.default_rng(2)
    X = rng.normal(size=(5, 3))
    dX = rng.normal(size=(5, 3))
    x = rng.normal(size=3)

    fd = centered_fd(lambda v: np.asarray(K.eval_KXX(k, jnp.reshape(jnp.asarray(v), (5, 3)), noise=0.0)),
                     X.ravel(), dX.ravel())
    an = np.asarray(K.eval_dKXX(k, jnp.asarray(X), jnp.asarray(dX)))
    np.testing.assert_allclose(an, fd, rtol=1e-6, atol=1e-9)

    fd = centered_fd(lambda v: np.asarray(K.eval_KxX(k, jnp.asarray(x), jnp.reshape(jnp.asarray(v), (5, 3)))),
                     X.ravel(), dX.ravel())
    an = np.asarray(K.eval_dKxX(k, jnp.asarray(x), jnp.asarray(X), jnp.asarray(dX)))
    np.testing.assert_allclose(an, fd, rtol=1e-6, atol=1e-9)

    fd = centered_fd(lambda v: np.asarray(K.eval_grad_KxX(k, jnp.asarray(x), jnp.reshape(jnp.asarray(v), (5, 3)))),
                     X.ravel(), dX.ravel())
    an = np.asarray(K.eval_dgrad_KxX(k, jnp.asarray(x), jnp.asarray(X), jnp.asarray(dX)))
    np.testing.assert_allclose(an, fd, rtol=1e-5, atol=1e-9)


def test_Dtheta_KXX():
    k = K.matern52((0.9,))
    rng = np.random.default_rng(3)
    X = rng.normal(size=(4, 2))
    dth = np.array([1.0])
    fd = centered_fd(
        lambda t: np.asarray(K.eval_KXX(K.RBFKernel(jnp.asarray(t), "matern52"), jnp.asarray(X), noise=0.0)),
        np.asarray(k.theta), dth)
    an = np.asarray(K.eval_Dtheta_KXX(k, jnp.asarray(X), jnp.asarray(dth)))
    np.testing.assert_allclose(an, fd, rtol=1e-6, atol=1e-9)

"""QMC stream + test-function checks (reference runtests.jl:68-81)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.models import testfns
from rollout_bo_tpu.ops import qmc, quadrature

from fd import centered_fd


def test_kronecker_range_and_shape():
    Z = qmc.kronecker_quasirand(3, 100)
    assert Z.shape == (100, 3)
    assert Z.min() >= 0.0 and Z.max() <= 1.0
    # low discrepancy: mean close to 0.5
    np.testing.assert_allclose(Z.mean(axis=0), 0.5, atol=0.05)


def test_sobol_skips_zero():
    S = qmc.sobol_uniform(8, dim=2)
    assert not np.any(np.all(S == 0.0, axis=1))


def test_box_muller_is_standard_normal():
    S = qmc.sobol_uniform(4096, dim=4)
    N = qmc.box_muller(S)
    assert abs(N.mean()) < 0.05
    np.testing.assert_allclose(N.std(), 1.0, atol=0.05)


def test_box_muller_log10_parity_variance():
    S = qmc.sobol_uniform(4096, dim=4)
    N = qmc.box_muller(S, log10_parity=True)
    # reference quirk: variance shrinks by log10(e) (utils.jl:33-35)
    np.testing.assert_allclose(N.std() ** 2, np.log10(np.e), atol=0.03)


def test_low_discrepancy_tensor_shape():
    N = qmc.gen_low_discrepancy_sequence(16, dim=3, horizon=4)
    assert N.shape == (16, 4, 4)
    assert np.all(np.isfinite(N))


def test_initial_guesses_in_bounds():
    G = qmc.generate_initial_guesses(10, [-1.0, 0.0], [2.0, 5.0])
    assert G.shape == (12, 2)
    assert (G[:, 0] >= -1.0).all() and (G[:, 0] <= 2.0).all()
    assert (G[:, 1] >= 0.0).all() and (G[:, 1] <= 5.0).all()


def test_gauss_hermite_tensor_indices():
    idx = quadrature.tensor_product_indices(3, 2)
    assert idx.shape == (9, 2)
    assert len({tuple(r) for r in idx}) == 9
    nodes, weights = quadrature.gauss_hermite(5)
    # integrates exp(-x^2): sum of weights = sqrt(pi)
    np.testing.assert_allclose(weights.sum(), np.sqrt(np.pi), rtol=1e-12)


KNOWN_MINIMA = [
    ("braninhoo", 0.397887),
    ("sixhump", -1.031628),
    ("gramacylee", None),
    ("ackley5d", 0.0),
    ("hartmann6d", -3.32237),
    ("griewank3d", 0.0),
    ("goldsteinprice", 3.0),
    ("levy10d", 0.0),
    ("rosenbrock", 0.0),
    ("schwefel10d", None),
    ("trid10d", None),
    ("styblinskitang4d", None),
]


@pytest.mark.parametrize("name,fmin", KNOWN_MINIMA, ids=lambda p: str(p))
def test_function_optimum_value(name, fmin):
    if fmin is None:
        f = testfns.get_function(name)
        v = float(f(np.asarray(f.xopt[0], dtype=float)))
        assert np.isfinite(v)
        return
    f = testfns.get_function(name)
    v = float(f(np.asarray(f.xopt[0], dtype=float)))
    np.testing.assert_allclose(v, fmin, atol=2e-4)


@pytest.mark.parametrize("name", ["ackley3d", "braninhoo", "sixhump", "levy2d",
                                  "styblinskitang2d", "griewank2d", "hartmann3d",
                                  "shekel", "dropwave", "bohachevsky", "rosenbrock",
                                  "goldsteinprice", "mccormick", "trid3d"])
def test_function_gradients_fd(name):
    f = testfns.get_function(name)
    rng = np.random.default_rng(7)
    x = rng.uniform(f.lbs * 0.4, f.ubs * 0.4)
    g = np.asarray(f.grad(x))
    for j in range(f.dim):
        dx = np.zeros(f.dim)
        dx[j] = 1.0
        fd = centered_fd(lambda u: float(f(jnp.asarray(u))), x, dx, h=1e-6)
        np.testing.assert_allclose(g[j], fd, rtol=2e-4, atol=1e-6)


def test_combinators():
    f1 = testfns.quadratic1d(2.0)
    f2 = testfns.quadratic1d(1.0, 1.0)
    s = f1 + f2
    np.testing.assert_allclose(float(s(np.array([0.5]))), 2 * 0.25 + (0.25 + 0.5))
    p = f1 * f2
    np.testing.assert_allclose(float(p(np.array([0.5]))), (2 * 0.25) * (0.25 + 0.5))
    sh = f1.hshift(np.array([1.0]))
    np.testing.assert_allclose(float(sh(np.array([0.5]))), 2 * 2.25)
    vs = f1.vshift(3.0)
    np.testing.assert_allclose(float(vs(np.array([0.5]))), 2 * 0.25 + 3.0)
    sc = f1.scalar_scale(2.0)
    np.testing.assert_allclose(float(sc(np.array([1.0]))), 2 * 0.25)

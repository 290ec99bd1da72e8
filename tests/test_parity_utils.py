"""Tests for the API-parity utility layer: constants, LazyStruct,
ExperimentSetup, lazy_posterior, dlog_likelihood, tplot, Sobol offsets.

reference components: constants.jl, lazy_struct.jl:15-62,
utils.jl:174-208 (ExperimentSetup), rbs.jl:224-310 (LazyStruct posterior),
rbs.jl:778-785 (δlog_likelihood), testfns.jl:99-114 (tplot).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu import constants
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models import testfns
from rollout_bo_tpu.models.decision_rules import EI
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.utils.experiment import ExperimentSetup
from rollout_bo_tpu.utils.lazy import LazyStruct


def _toy_state(n=6, d=2, seed=0, capacity=12):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, d))
    y = np.sin(X.sum(axis=1)) + 0.1 * rng.standard_normal(n)
    return sg.fit(K.matern52((1.0,)), X, y, capacity=capacity, noise=1e-6)


def test_constants_values():
    assert constants.RANDOM_ACQUISITION == "Random"
    assert constants.GROUND_TRUTH_OBSERVATIONS == -1
    assert constants.DEFAULT_CAPACITY == sg.DEFAULT_CAPACITY == 100


class TestLazyStruct:
    def test_force_once(self):
        calls = []
        s = LazyStruct()
        s.a = lambda: calls.append(1) or 42
        assert s.a == 42
        assert s.a == 42
        assert calls == [1]
        assert "a" in s and "b" not in s

    def test_dependent_thunks(self):
        s = LazyStruct()
        s.base = lambda: 3
        s.sq = lambda: s.base**2
        assert s.sq == 9
        assert set(s.forced()) == {"base", "sq"}

    def test_set_replaces_and_invalidates(self):
        s = LazyStruct()
        s.set("a", lambda: 1)
        assert s.a == 1
        s.set("a", lambda: 2)
        assert s.a == 2

    def test_non_thunk_rejected(self):
        s = LazyStruct()
        with pytest.raises(TypeError):
            s.a = 5

    def test_missing_attr(self):
        with pytest.raises(AttributeError):
            LazyStruct().nope


def test_lazy_posterior_matches_posterior():
    st = _toy_state()
    x = jnp.asarray([0.3, -0.2])
    lp = sg.lazy_posterior(st, x, rule=EI(), theta=jnp.zeros((1,)))
    p = sg.posterior(st, x)
    np.testing.assert_allclose(np.asarray(lp.mu), np.asarray(p.mu))
    np.testing.assert_allclose(np.asarray(lp.grad_sigma), np.asarray(p.grad_sigma))
    a, g = sg.acquisition_grad(st, EI(), x, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(lp.alpha), np.asarray(a))
    np.testing.assert_allclose(np.asarray(lp.grad_alpha), np.asarray(g))
    assert lp.dsigma.shape == (3, 3)


def test_dlog_likelihood_matches_grad():
    st = _toy_state()
    g = sg.grad_log_likelihood(st)
    v = jnp.asarray([0.7])
    directional = sg.dlog_likelihood(st, v)
    np.testing.assert_allclose(
        float(directional), float(jnp.dot(g, v)), rtol=1e-10)


def test_dlog_likelihood_matches_fd():
    st = _toy_state()
    h = 1e-6
    up = sg.log_likelihood(sg.set_kernel(
        st, st.kernel.replace_theta(st.kernel.theta + h)))
    dn = sg.log_likelihood(sg.set_kernel(
        st, st.kernel.replace_theta(st.kernel.theta - h)))
    fd = (float(up) - float(dn)) / (2 * h)
    np.testing.assert_allclose(
        float(sg.dlog_likelihood(st, jnp.ones(1))), fd, rtol=1e-5)


class TestExperimentSetup:
    def test_shapes(self):
        f = testfns.get_function("braninhoo")
        es = ExperimentSetup.build(
            f.lbs, f.ubs, horizon=2, mc_iters=16, num_starts=5,
            num_restarts=4)
        # generate_initial_guesses appends the two eps-interior corner
        # points (reference utils.jl:145-153) -> num_starts + 2 rows
        assert es.xstarts.shape == (7, 2)
        assert es.restarts.shape == (4, 2)
        assert es.tp.rnstream.shape == (16, 3, 3)
        assert es.tp.horizon == 2 and es.tp.mc_iters == 16
        # starts strictly inside the box
        assert np.all(np.asarray(es.xstarts) > f.lbs)
        assert np.all(np.asarray(es.xstarts) < f.ubs)

    def test_resample_changes_stream(self):
        f = testfns.get_function("braninhoo")
        es = ExperimentSetup.build(f.lbs, f.ubs, horizon=1, mc_iters=8)
        rng = np.random.default_rng(3)
        es2 = es.resample(rng, start_index=1)
        assert not np.allclose(np.asarray(es.tp.rnstream),
                               np.asarray(es2.tp.rnstream))
        # same shapes, and still roughly standard normal
        assert es2.tp.rnstream.shape == es.tp.rnstream.shape

    def test_pseudo_random_mode(self):
        f = testfns.get_function("braninhoo")
        es = ExperimentSetup.build(
            f.lbs, f.ubs, horizon=1, mc_iters=512,
            variance_reduction=False, rng=np.random.default_rng(7))
        z = np.asarray(es.tp.rnstream)
        assert abs(z.mean()) < 0.1 and abs(z.std() - 1.0) < 0.1


def test_sobol_start_offset_disjoint():
    a = qmc.sobol_uniform(8, dim=3)
    b = qmc.sobol_uniform(8, dim=3, start=8)
    both = qmc.sobol_uniform(16, dim=3)
    np.testing.assert_allclose(a, both[:8])
    np.testing.assert_allclose(b, both[8:])


def test_gen_low_discrepancy_start_segments():
    z0 = qmc.gen_low_discrepancy_sequence(4, 2, 3, start=0)
    z1 = qmc.gen_low_discrepancy_sequence(4, 2, 3, start=1)
    assert z0.shape == z1.shape == (4, 3, 3)
    assert not np.allclose(z0, z1)


def test_tplot_1d_and_2d():
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    ax = testfns.tplot(testfns.get_function("gramacylee"), num_points=32)
    assert len(ax.lines) == 1
    ax2 = testfns.tplot(testfns.get_function("braninhoo"), num_points=16)
    assert ax2 is not None
    with pytest.raises(ValueError):
        testfns.tplot(testfns.get_function("hartmann3d"))

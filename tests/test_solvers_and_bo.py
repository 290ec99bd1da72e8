"""Inner solver quality + myopic BO end-to-end (reference §3.1 slice)."""

import jax
import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models import testfns
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout import bo, solvers


def make_state(n=10, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(n, d))
    y = np.sum(X**2, axis=1)  # bowl: EI prefers unexplored low-mean areas
    return sg.fit(K.matern52((1.0,)), X, y, capacity=32, noise=1e-6)


def test_newton_solver_finds_stationary_point():
    st = make_state()
    theta = jnp.asarray([0.0])
    rule = dr.EI()
    lbs, ubs = np.full(2, -2.0), np.full(2, 2.0)
    starts = qmc.generate_initial_guesses(16, lbs, ubs)
    res = solvers.multistart_maximize(st, rule, theta, lbs, ubs, starts, iterations=20)
    a, g, H = sg.acquisition_value_grad_hess(st, rule, res.x, theta)
    assert float(a) > 0
    interior = np.all(np.asarray(res.x) > lbs + 1e-6) and np.all(np.asarray(res.x) < ubs - 1e-6)
    if interior:
        # stationarity at the argmax
        assert float(jnp.linalg.norm(g)) < 1e-5 * max(1.0, abs(float(a)))
    # solver value beats a dense random search
    rng = np.random.default_rng(3)
    Xrand = rng.uniform(-2, 2, size=(4096, 2))
    vals = jax.vmap(lambda x: sg.acquisition(st, rule, x, theta))(jnp.asarray(Xrand))
    assert float(res.value) >= float(jnp.max(vals)) - 1e-6


def test_solver_handles_nan_starts():
    st = make_state()
    theta = jnp.asarray([0.0])
    starts = np.array([[np.nan, np.nan], [0.5, 0.5]])
    res = solvers.multistart_maximize(st, dr.EI(), theta, [-2, -2], [2, 2], starts)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_random_rule_uniform():
    st = make_state()
    res = solvers.multistart_maximize(
        st, dr.RandomAcquisition(), jnp.asarray([0.0]), [-2, -2], [2, 2],
        np.zeros((4, 2)), key=jax.random.PRNGKey(0))
    x = np.asarray(res.x)
    assert np.all(x >= -2) and np.all(x <= 2)


def test_myopic_bo_improves_on_braninhoo():
    f = testfns.get_function("braninhoo")
    res = bo.run_myopic_bo(f, dr.EI(), budget=12, num_starts=12, seed=7,
                           solver_iterations=10)
    assert res.gaps.shape == (12,)
    assert np.all(np.isfinite(res.y))
    # gap should improve materially over 12 iterations on branin
    assert res.gaps[-1] >= res.gaps[0]
    assert res.minimum_observations[-1] <= res.y[:5].min() + 1e-9
    assert res.gaps[-1] > 0.3


def test_myopic_bo_random_baseline_runs():
    f = testfns.get_function("sixhump")
    res = bo.run_myopic_bo(f, dr.RandomAcquisition(), budget=5, num_starts=4, seed=1)
    assert np.all(np.isfinite(res.y))

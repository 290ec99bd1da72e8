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


def test_loose_acceptance_freezes_on_plateau():
    """IPNewton-style loose stop (DecisionRule.solve_f_tol/x_tol,
    reference rbf_optim.jl:26-30): on POI's saturated plateau a loose
    start freezes at (or an epsilon from) its start point, while the
    exact solver climbs to the sharp argmax — the difference that makes
    POI's regret match the reference (PARITY.md "POI saturation")."""
    st = make_state()
    theta = jnp.asarray([0.0])
    lbs, ubs = np.full(2, -2.0), np.full(2, 2.0)
    starts = qmc.generate_initial_guesses(8, lbs, ubs)

    # POI ships loose by default; EI stays exact
    assert dr.POI().solve_f_tol == 1e-3 and dr.EI().solve_f_tol == 0.0

    # pin the freeze mechanism with a COARSE tolerance on EI (5% relative
    # improvement): the loose path must stop strictly earlier along the
    # same ascent than the exact fixed-iteration solver, at slightly
    # lower (never higher) values
    coarse = dr.DecisionRule("EI", 1e-8, 0.05, 0.05)
    xs_l, vs_l = solvers.newton_solve_batch(st, coarse, theta, lbs, ubs,
                                            starts, iterations=20)
    xs_e, vs_e = solvers.newton_solve_batch(st, dr.EI(), theta, lbs, ubs,
                                            starts, iterations=20)
    move_l = np.linalg.norm(np.asarray(xs_l) - np.asarray(starts), axis=1)
    move_e = np.linalg.norm(np.asarray(xs_e) - np.asarray(starts), axis=1)
    assert move_l.sum() < move_e.sum() - 1e-3
    assert np.all(np.asarray(vs_l) <= np.asarray(vs_e) + 1e-12)
    assert np.all(np.isfinite(np.asarray(xs_l)))


def test_solver_handles_nan_starts():
    st = make_state()
    theta = jnp.asarray([0.0])
    starts = np.array([[np.nan, np.nan], [0.5, 0.5]])
    res = solvers.multistart_maximize(st, dr.EI(), theta, [-2, -2], [2, 2], starts)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_logpoi_matches_log_of_poi_and_is_stable():
    """LogPOI == log(POI) wherever POI is representable (=> same argmax);
    finite with a nonzero gradient where POI underflows/clamps flat."""
    st = make_state()
    theta = jnp.asarray([0.0])
    poi, logpoi = dr.POI(), dr.LogPOI()

    for xv in ([0.1, 0.2], [-0.5, 0.4], [1.0, -1.0]):
        x = jnp.asarray(xv)
        a = float(sg.acquisition(st, poi, x, theta))
        la = float(sg.acquisition(st, logpoi, x, theta))
        if a > 1e-250:
            np.testing.assert_allclose(la, np.log(a), rtol=1e-8)

    # deep-tail stability: POI's Phi(z) underflows (f32: z < -12) and its
    # z-clamp flattens any dtype beyond |z|=30; log_ndtr keeps a finite
    # value and a usable gradient (|d log Phi/dz| ~ |z|)
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(8, 1))
    y = 1e4 * X[:, 0] ** 2
    st1 = sg.fit(K.matern52((0.5,)), X, y, capacity=8, noise=1e-6)
    xfar = jnp.asarray([1.9])
    assert abs(float(sg.acquisition(st1, poi, xfar, theta))) < 1e-100
    la, gla = sg.acquisition_grad(st1, logpoi, xfar, theta)
    assert np.isfinite(float(la)) and float(la) < -100.0
    assert np.all(np.isfinite(np.asarray(gla)))
    assert float(jnp.abs(gla).max()) > 0.0

    # argmax equivalence at solver level on a healthy surface: the LogPOI
    # multistart winner and the POI multistart winner agree
    lbs, ubs = np.full(2, -2.0), np.full(2, 2.0)
    starts = qmc.generate_initial_guesses(16, lbs, ubs)
    r1 = solvers.multistart_maximize(st, poi, theta, lbs, ubs, starts, iterations=20)
    r2 = solvers.multistart_maximize(st, logpoi, theta, lbs, ubs, starts, iterations=20)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=5e-3)


def test_logei_matches_log_of_ei_and_is_stable():
    """LogEI == log(EI) wherever EI is representable; finite (with a
    nonzero gradient) where f32-scale EI underflows; same solver argmax."""
    st = make_state()
    theta = jnp.asarray([0.0])
    ei, logei = dr.EI(), dr.LogEI()

    # agreement region: points near the data where EI is healthy
    for xv in ([0.1, 0.2], [-0.5, 0.4], [1.0, -1.0]):
        x = jnp.asarray(xv)
        a = float(sg.acquisition(st, ei, x, theta))
        la = float(sg.acquisition(st, logei, x, theta))
        if a > 1e-250:
            np.testing.assert_allclose(la, np.log(a), rtol=1e-10)

    # deep-tail stability: z << 0 (far above the incumbent) — EI
    # underflows to exactly 0 (log undefined) but LogEI stays finite
    # with a finite, nonzero gradient for the solver to follow
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(8, 1))
    y = (1e4 * X[:, 0] ** 2)  # huge range -> enormous |z| off-minimum
    st1 = sg.fit(K.matern52((0.5,)), X, y, capacity=8, noise=1e-6)
    xfar = jnp.asarray([1.9])
    # EI is numerically useless here (|EI| < 1e-100, and the clamped-z
    # arithmetic can even make it slightly negative)
    assert abs(float(sg.acquisition(st1, ei, xfar, theta))) < 1e-100
    la, gla = sg.acquisition_grad(st1, logei, xfar, theta)
    assert np.isfinite(float(la)) and float(la) < -100.0
    assert np.all(np.isfinite(np.asarray(gla)))
    assert float(jnp.abs(gla).max()) > 0.0

    # same argmax basin as EI on a healthy surface
    lbs, ubs = np.full(2, -2.0), np.full(2, 2.0)
    starts = qmc.generate_initial_guesses(16, lbs, ubs)
    r_ei = solvers.multistart_maximize(st, ei, theta, lbs, ubs, starts,
                                       iterations=20)
    r_log = solvers.multistart_maximize(st, logei, theta, lbs, ubs, starts,
                                        iterations=20)
    np.testing.assert_allclose(np.asarray(r_log.x), np.asarray(r_ei.x),
                               atol=2e-3)


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


def test_myopic_bo_fused_chunks_match_per_step():
    """The fused trial program (whole budget as one lax.scan dispatch)
    must reproduce the per-iteration-dispatch loop exactly: same sampled
    points, observations, and gap curve (steps_per_call=1 vs 0)."""
    f = testfns.get_function("sixhump")
    r1 = bo.run_myopic_bo(f, dr.EI(), budget=8, num_starts=8, seed=13,
                          solver_iterations=10, steps_per_call=1)
    bo._PROGRAM_CACHE.clear()
    r2 = bo.run_myopic_bo(f, dr.EI(), budget=8, num_starts=8, seed=13,
                          solver_iterations=10, steps_per_call=0)
    np.testing.assert_allclose(r1.X, r2.X, rtol=0, atol=0)
    np.testing.assert_allclose(r1.y, r2.y, rtol=0, atol=0)
    np.testing.assert_allclose(r1.gaps, r2.gaps, rtol=0, atol=0)
    np.testing.assert_allclose(r1.minimum_observations,
                               r2.minimum_observations, rtol=0, atol=0)


def test_myopic_bo_random_baseline_runs():
    f = testfns.get_function("sixhump")
    res = bo.run_myopic_bo(f, dr.RandomAcquisition(), budget=5, num_starts=4, seed=1)
    assert np.all(np.isfinite(res.y))


def _overconfident_state(dtype=jnp.float32):
    """A surrogate whose MC rollout acquisition is exactly zero everywhere:
    tight 1-d gramacylee fit where no +-3sigma draw crosses the incumbent
    (the state that froze every outer restart before the exploration
    fallback existed)."""
    X = np.array([1.28383, 1.03912, 1.16751, 1.67047, 2.00633, 1.5, 2.5,
                  0.5, 0.70338, 0.8217])[:, None]
    f = testfns.gramacylee()
    y = np.asarray(f.batch(X))
    return sg.fit(K.matern52((0.266,)), X, y, capacity=16, noise=1e-6,
                  dtype=dtype)


def test_exploration_fallback_finds_nonzero_ei_point():
    """When the rollout estimate is flat zero, the fallback's analytic
    myopic EI solve must return a NEW in-bounds point with positive EI
    (the reference instead re-samples a duplicate and the trial dies,
    adaptive_bayesopt.jl:492-542)."""
    st = _overconfident_state(dtype=None)  # run in the suite's f64
    dt = st.X.dtype
    theta = jnp.asarray([0.0], dt)
    lbs_j, ubs_j = jnp.asarray([0.5], dt), jnp.asarray([2.5], dt)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(8, [0.5], [2.5]), dt)
    fb = bo._make_exploration_fallback(dr.EI(), theta, lbs_j, ubs_j,
                                       xstarts, 12)
    x, v = fb(st)
    # the fallback solves the LOG-EI surface (never flat); its value is
    # log EI — finite means the solve found a usable (positive-EI) point
    assert np.isfinite(float(v))
    assert 0.5 <= float(x[0]) <= 2.5
    # must not be a (near-)duplicate of an observed point
    assert float(np.min(np.abs(np.asarray(st.X[:10, 0]) - float(x[0])))) > 1e-3


def test_nonmyopic_bo_does_not_resample_duplicates():
    """f32 end-to-end: zero-EI plateaus must not trap the loop on one
    point (regression for the stuck-midpoint failure mode)."""
    f = testfns.gramacylee()
    res = bo.run_nonmyopic_bo(
        f, horizon=0, mc_iters=16, budget=6, num_starts=8, num_restarts=4,
        sgd_iters=10, seed=11, solver_iterations=10, dtype=jnp.float32,
        outer_solver="scanned", steps_per_call=5)
    sampled = res.X[5:, 0]
    for i in range(1, len(sampled)):
        assert float(np.min(np.abs(sampled[i] - sampled[:i]))) > 1e-5, \
            f"duplicate sample at BO iteration {i}: {sampled}"

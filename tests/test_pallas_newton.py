"""Pallas multistart-Newton kernel vs the XLA reference solver.

Runs the kernel in interpreter mode on CPU (same math path as Mosaic)
and pins equivalence against rollout/solvers.py::newton_solve_batch —
the same A/B methodology used for every previous solver change (PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import pallas_newton as pn
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout import solvers

f32 = jnp.float32


def _random_states(L, n, d, cap, kind, seed=0, ell=0.8):
    """L independent f32 surrogate states (as stacked arrays) + views."""
    rng = np.random.default_rng(seed)
    kern = K.RBFKernel(theta=jnp.asarray([ell], f32), kind=kind)
    states = []
    for _ in range(L):
        X = rng.uniform(-1.0, 1.0, (n, d))
        y = np.sin(2.0 * X.sum(axis=1)) + 0.2 * rng.standard_normal(n)
        states.append(sg.fit(kern, X, y, capacity=cap, noise=1e-5, dtype=f32))
    return states


def _pack(states):
    X = jnp.stack([s.X for s in states])
    Li = jnp.stack([s.Li for s in states])
    W = jnp.einsum("lji,ljk->lik", Li, Li)  # K^{-1} = Li^T Li
    c = jnp.stack([s.c for s in states])
    n = jnp.stack([s.n for s in states])
    fmini = jnp.stack([sg.get_active_minimum(s) for s in states])
    return X, W, c, n, fmini


@pytest.mark.parametrize("kind", ["matern52", "squared_exponential",
                                  "matern32"])
def test_profile_terms_match_autodiff(kind):
    ell = 0.7
    kern = K.RBFKernel(theta=jnp.asarray([ell], f32), kind=kind)
    rho = jnp.asarray([0.05, 0.3, 1.1, 2.7], f32)
    sq = rho * rho
    psi, a, b, iso = pn._profile_terms(kind, rho, sq, jnp.asarray(ell, f32))
    psi_ref = jax.vmap(kern.psi)(rho)
    dpsi_ref = jax.vmap(kern.dpsi)(rho)
    d2psi_ref = jax.vmap(kern.d2psi)(rho)
    np.testing.assert_allclose(psi, psi_ref, rtol=2e-6)
    np.testing.assert_allclose(a, dpsi_ref / rho, rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(
        b, (d2psi_ref - dpsi_ref / rho) / sq, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(iso, dpsi_ref / rho, rtol=3e-5, atol=1e-7)


@pytest.mark.parametrize("rule_name", ["EI", "POI", "LogEI", "LogPOI"])
def test_rule_partials_match_autodiff(rule_name):
    rule = getattr(dr, rule_name)()
    mu = jnp.asarray([0.3, -1.2, 0.8], f32)
    sigma = jnp.asarray([0.5, 0.05, 1.4], f32)
    th = jnp.zeros((3,), f32)
    fmini = jnp.asarray([0.1, 0.1, 2.0], f32)
    got = pn._rule_partials(rule_name, mu, sigma, th, fmini, 1e-8)
    thv = jnp.zeros((1,), f32)
    want = [
        jax.vmap(lambda m, s, f: rule.dg_dmu(m, s, thv, f))(mu, sigma, fmini),
        jax.vmap(lambda m, s, f: rule.dg_dsigma(m, s, thv, f))(mu, sigma, fmini),
        jax.vmap(lambda m, s, f: rule.d2g_dmu(m, s, thv, f))(mu, sigma, fmini),
        jax.vmap(lambda m, s, f: rule.d2g_dsigma(m, s, thv, f))(mu, sigma, fmini),
        jax.vmap(lambda m, s, f: rule.d2g_dmudsigma(m, s, thv, f))(mu, sigma, fmini),
    ]
    for g, w in zip(got, want):
        # atol 1e-4: at saturated z the XLA side leaves ~1e-5 of rounding
        # noise where the exact partial underflows (e.g. LogEI's
        # dg_dsigma = phi/g ~ 1e-148 at z = 26 prints as 6e-5 there)
        np.testing.assert_allclose(g, w, rtol=5e-5, atol=1e-4)


@pytest.mark.parametrize("rule_name", ["LogEI", "LogPOI"])
def test_log_rule_tails_match_float64_autodiff(rule_name):
    """Deep-tail partials vs FLOAT64 autodiff truth + asymptotics.

    The f32 XLA autodiff of the log rules loses the second-order partials
    below z ~ -20 (log-difference cancellation in the mills chain) and the
    old f32 LogEI tail even went -inf below z ~ -100. The kernel's
    polynomial mills corrections (_mills_c/_mills_q + expm1/log1p-series
    factoring) stay accurate, so the reference is the float64 rule —
    itself only trustworthy for SECOND-order partials down to z ~ -150
    (beyond that even f64 autodiff amplifies the 1 + z*mills cancellation
    to O(1) garbage), so the extreme tail is pinned against the exact
    asymptotics u', r' -> -1 instead."""
    import jax.numpy as jnp_

    rule64 = getattr(dr, rule_name)()
    s = 0.5
    mu = jnp.asarray([2.6, 10.0, 60.0], f32)       # z in [-5, -120]
    sigma = jnp.full((3,), s, f32)
    th = jnp.zeros((3,), f32)
    fmini = jnp.full((3,), 0.1, f32)
    got_v = pn._rule_value(rule_name, mu, sigma, th, fmini, 1e-8)
    got = pn._rule_partials(rule_name, mu, sigma, th, fmini, 1e-8)
    thv64 = jnp.zeros((1,), jnp_.float64)
    as64 = lambda a: jnp_.asarray(np.asarray(a), jnp_.float64)
    want_v = jax.vmap(lambda m, s_, f: rule64(m, s_, thv64, f))(
        as64(mu), as64(sigma), as64(fmini))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-5, atol=1e-4)
    assert np.all(np.isfinite(np.asarray(got_v)))
    fns = [rule64.dg_dmu, rule64.dg_dsigma, rule64.d2g_dmu,
           rule64.d2g_dsigma, rule64.d2g_dmudsigma]
    for g, fn in zip(got, fns):
        w = jax.vmap(lambda m, s_, f: fn(m, s_, thv64, f))(
            as64(mu), as64(sigma), as64(fmini))
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-3, atol=1e-6)

    # extreme tail (z = -900, -6e4): exact asymptotics of the curvature
    # chain — u'(z), r'(z) -> -1, so gmumu -> -1/s^2, gmusig -> 2|z|/s^2,
    # and the value follows -z^2/2 + lower order
    mu_x = jnp.asarray([450.0, 3e4], f32)
    sig_x = jnp.full((2,), s, f32)
    th_x = jnp.zeros((2,), f32)
    fm_x = jnp.full((2,), 0.1, f32)
    z_x = (np.asarray(fm_x) - np.asarray(mu_x)) / s
    v_x = pn._rule_value(rule_name, mu_x, sig_x, th_x, fm_x, 1e-8)
    gmu, gsig, gmumu, gsigsig, gmusig = pn._rule_partials(
        rule_name, mu_x, sig_x, th_x, fm_x, 1e-8)
    assert np.all(np.isfinite(np.asarray(v_x)))
    np.testing.assert_allclose(np.asarray(v_x), -0.5 * z_x**2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gmu), -np.abs(z_x) / s, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gmumu), -1.0 / s**2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gmusig), 2.0 * np.abs(z_x) / s**2,
                               rtol=2e-2)
    # 2zu + z^2 u' -> -2z^2 - z^2 = -3z^2 (and likewise for r)
    np.testing.assert_allclose(np.asarray(gsigsig), -3.0 * (z_x**2) / s**2,
                               rtol=2e-2)


@pytest.mark.parametrize("kind,rule_name", [
    ("matern52", "EI"),
    ("squared_exponential", "EI"),
    ("matern52", "POI"),
    ("matern52", "LCB"),
    ("matern52", "LogEI"),
    ("matern52", "LogPOI"),
])
def test_pallas_solve_matches_xla_solver(kind, rule_name):
    L, n, d, cap, S = 5, 7, 3, 12, 4
    states = _random_states(L, n, d, cap, kind, seed=3)
    X, W, c, nn, fmini = _pack(states)
    lbs = np.full(d, -1.0)
    ubs = np.full(d, 1.0)
    xstarts = qmc.generate_initial_guesses(S - 2, lbs, ubs).astype(np.float32)
    rule = getattr(dr, rule_name)()
    theta = jnp.asarray([0.5] if rule_name == "LCB" else [0.0], f32)
    iters = 8

    xs_p, vs_p = pn.newton_solve_lanes(
        X, W, c, nn, fmini, jnp.full((L,), theta[0], f32),
        states[0].kernel.theta[0], lbs, ubs, xstarts,
        kind=kind, rule=rule_name, iterations=iters, interpret=True,
    )

    for i, st in enumerate(states):
        xs, vals = solvers.newton_solve_batch(
            st, rule, theta, lbs, ubs, xstarts, iterations=iters)
        vbest = float(jnp.max(vals))
        # (a) the kernel's internal posterior/acquisition math agrees with
        # an XLA re-evaluation at the kernel's solution (f32 op-ordering:
        # the kernel computes var = k0 - kx.(K^{-1} kx), the XLA path
        # k0 - ||Li kx||^2 — identical math, different cancellation)
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        # log-scale rules compare with an absolute tolerance in log space
        # (2e-3 in log = 0.2% in probability space): the f32 posterior
        # op-ordering noise between the kernel (k0 - kx.(K^{-1} kx)) and
        # the XLA path (k0 - ||Li kx||^2) is amplified by the log where
        # the variance nearly cancels close to data; assertion (b) below
        # is the actual solution-quality gate
        atol = 2e-3 if rule_name.startswith("Log") else 1e-6
        np.testing.assert_allclose(float(vs_p[i]), v_cross,
                                   rtol=2e-3, atol=atol)
        # (b) solution quality is never worse than the XLA solver (tiny fp
        # differences may flip a backtracking accept into a better basin)
        assert v_cross >= vbest - 5e-4 * max(1.0, abs(vbest)) - 1e-6


def test_pallas_solve_10d_trid_scale():
    """Headline-benchmark-like shape: d=10, larger domain, EI."""
    from rollout_bo_tpu.models import testfns

    f = testfns.get_function("trid10d")
    d = f.dim
    L, n, cap, S = 3, 12, 20, 6
    rng = np.random.default_rng(11)
    kern = K.matern52((1.0,))
    states = []
    for _ in range(L):
        X0 = qmc.randsample(n, d, f.lbs, f.ubs, rng)
        y0 = np.asarray(f.batch(X0))
        states.append(sg.fit(kern, X0, y0, capacity=cap, noise=1e-5, dtype=f32))
    X, W, c, nn, fmini = _pack(states)
    xstarts = qmc.generate_initial_guesses(S - 2, f.lbs, f.ubs).astype(np.float32)
    rule = dr.EI()
    theta = jnp.zeros((1,), f32)

    xs_p, vs_p = pn.newton_solve_lanes(
        X, W, c, nn, fmini, jnp.zeros((L,), f32),
        states[0].kernel.theta[0], f.lbs, f.ubs, xstarts,
        kind="matern52", rule="EI", iterations=10, interpret=True,
    )
    for i, st in enumerate(states):
        xs, vals = solvers.newton_solve_batch(
            st, rule, theta, f.lbs, f.ubs, xstarts, iterations=10)
        vbest = float(jnp.max(vals))
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        np.testing.assert_allclose(float(vs_p[i]), v_cross,
                                   rtol=1e-3, atol=1e-5 * max(1.0, abs(vbest)))
        assert v_cross >= vbest - 1e-3 * max(1.0, abs(vbest))


def test_lane_padding_and_per_lane_n():
    """Lanes beyond L are padding; per-lane active counts differ."""
    kind = "matern52"
    states = _random_states(3, 5, 2, 10, kind, seed=9)
    # give lane 2 a different active count by conditioning one more point
    states[2] = sg.condition(states[2], jnp.asarray([0.2, -0.3], f32),
                             jnp.asarray(0.5, f32))
    X, W, c, nn, fmini = _pack(states)
    lbs, ubs = np.full(2, -1.0), np.full(2, 1.0)
    xstarts = qmc.generate_initial_guesses(3, lbs, ubs).astype(np.float32)
    xs_p, vs_p = pn.newton_solve_lanes(
        X, W, c, nn, fmini, jnp.zeros((3,), f32),
        states[0].kernel.theta[0], lbs, ubs, xstarts,
        kind=kind, rule="EI", iterations=6, interpret=True,
    )
    assert xs_p.shape == (3, 2) and vs_p.shape == (3,)
    rule = dr.EI()
    theta = jnp.zeros((1,), f32)
    for i, st in enumerate(states):
        _, vals = solvers.newton_solve_batch(
            st, rule, theta, lbs, ubs, xstarts, iterations=6)
        vbest = float(jnp.max(vals))
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        np.testing.assert_allclose(float(vs_p[i]), v_cross,
                                   rtol=5e-4, atol=1e-6)
        assert v_cross >= vbest - 5e-4 * max(1.0, abs(vbest)) - 1e-6


def test_custom_vmap_nesting_flattens():
    """solve_one composes under single and double vmap."""
    kind = "matern52"
    L1, L2 = 2, 3
    states = _random_states(L1 * L2, 6, 2, 10, kind, seed=21)
    X, W, c, nn, fmini = _pack(states)
    Li = jnp.stack([s.Li for s in states])
    lbs, ubs = np.full(2, -1.0), np.full(2, 1.0)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(3, lbs, ubs), f32)
    from rollout_bo_tpu.ops.pallas_newton import get_solver

    solve_one = get_solver(kind, "EI", 6, True)
    ell = states[0].kernel.theta[0]
    lbsj, ubsj = jnp.asarray(lbs, f32), jnp.asarray(ubs, f32)
    th = jnp.zeros((), f32)

    one = jnp.ones((), f32)
    flat = jax.vmap(
        lambda x, li, cc, n_, fm: solve_one(
            x, li, cc, n_, fm, th, ell, lbsj, ubsj, xstarts, one)
    )(X, Li, c, nn, fmini)

    nested = jax.vmap(jax.vmap(
        lambda x, li, cc, n_, fm: solve_one(
            x, li, cc, n_, fm, th, ell, lbsj, ubsj, xstarts, one)
    ))(X.reshape(L1, L2, *X.shape[1:]), Li.reshape(L1, L2, *Li.shape[1:]),
       c.reshape(L1, L2, -1), nn.reshape(L1, L2), fmini.reshape(L1, L2))

    np.testing.assert_allclose(np.asarray(flat[0]),
                               np.asarray(nested[0]).reshape(L1 * L2, -1))
    np.testing.assert_allclose(np.asarray(flat[1]),
                               np.asarray(nested[1]).reshape(L1 * L2))


def test_rollout_grad_with_pallas_interpret():
    """simulate_trajectory_mc: pallas route == XLA route (value + grads)."""
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.rollout import mc as mc_mod
    from rollout_bo_tpu.rollout import solvers
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function("braninhoo")
    d = f.dim
    rng = np.random.default_rng(2)
    X0 = qmc.randsample(5, d, f.lbs, f.ubs, rng)
    y0 = np.asarray(f.batch(X0))
    state = sg.fit(K.matern52((1.0,)), X0, y0, capacity=10, noise=1e-5,
                   dtype=f32)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(3, f.lbs, f.ubs), f32)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(8, d, 2), f32)
    tp = TrajectoryParams(
        x0=jnp.asarray(X0[0] + 0.3, f32), theta=jnp.zeros((1,), f32),
        lbs=jnp.asarray(f.lbs, f32), ubs=jnp.asarray(f.ubs, f32), rnstream=z)

    old = solvers._PALLAS_MODE
    try:
        solvers._PALLAS_MODE = "0"
        eto_x = mc_mod.simulate_trajectory_mc(
            state, tp, dr.EI(), xstarts, with_gradients=True, iterations=6)
        solvers._PALLAS_MODE = "interpret"
        eto_p = mc_mod.simulate_trajectory_mc(
            state, tp, dr.EI(), xstarts, with_gradients=True, iterations=6)
    finally:
        solvers._PALLAS_MODE = old

    np.testing.assert_allclose(float(eto_x.mu), float(eto_p.mu),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eto_x.grad_x),
                               np.asarray(eto_p.grad_x),
                               rtol=2e-2, atol=2e-4)


f64 = jnp.float64


def _random_states_f64(L, n, d, cap, kind, seed=0, ell=0.8):
    rng = np.random.default_rng(seed)
    kern = K.RBFKernel(theta=jnp.asarray([ell], f64), kind=kind)
    states = []
    for _ in range(L):
        X = rng.uniform(-1.0, 1.0, (n, d))
        y = np.sin(2.0 * X.sum(axis=1)) + 0.2 * rng.standard_normal(n)
        states.append(sg.fit(kern, X, y, capacity=cap, noise=1e-5, dtype=f64))
    return states


def test_pallas_f64_loose_poi_matches_xla():
    """f64 lanes + IPNewton-loose freeze: the POI-parity configuration
    (dtype float64, solve_f_tol = solve_x_tol = 1e-3, rbf_optim.jl:26-30)
    runs on the kernel and agrees with the XLA loose solver."""
    kind = "matern52"
    L, n, d, cap, S = 4, 7, 3, 12, 4
    states = _random_states_f64(L, n, d, cap, kind, seed=5)
    X, W, c, nn, fmini = _pack(states)
    assert X.dtype == f64
    lbs, ubs = np.full(d, -1.0), np.full(d, 1.0)
    xstarts = qmc.generate_initial_guesses(S - 2, lbs, ubs)
    rule = dr.POI()  # solve_f_tol = solve_x_tol = 1e-3 by default
    theta = jnp.zeros((1,), f64)
    iters = 8

    xs_p, vs_p = pn.newton_solve_lanes(
        X, W, c, nn, fmini, jnp.zeros((L,), f64),
        states[0].kernel.theta[0], lbs, ubs, xstarts,
        kind=kind, rule="POI", iterations=iters,
        f_tol=rule.solve_f_tol, x_tol=rule.solve_x_tol, interpret=True,
    )
    assert xs_p.dtype == f64

    for i, st in enumerate(states):
        xs, vals = solvers.newton_solve_batch(
            st, rule, theta, lbs, ubs, xstarts, iterations=iters)
        vbest = float(jnp.max(vals))
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        # both sides run the identical loose-freeze algorithm; in f64 the
        # op-ordering noise (K^{-1} vs Li variance form) is ~1e-12, far
        # below any freeze threshold, so the frozen solutions coincide
        np.testing.assert_allclose(float(vs_p[i]), v_cross,
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(v_cross, vbest, rtol=1e-6, atol=1e-9)


def test_pallas_loose_freeze_f32_matches_xla():
    """f32 loose-acceptance lanes vs the XLA loose branch (EI with the
    IPNewton tolerances forced)."""
    kind = "matern52"
    L, n, d, cap, S = 4, 6, 2, 10, 4
    states = _random_states(L, n, d, cap, kind, seed=13)
    X, W, c, nn, fmini = _pack(states)
    lbs, ubs = np.full(d, -1.0), np.full(d, 1.0)
    xstarts = qmc.generate_initial_guesses(S - 2, lbs, ubs).astype(np.float32)
    rule = dr.DecisionRule("EI", 1e-8, 1e-3, 1e-3)
    theta = jnp.zeros((1,), f32)

    xs_p, vs_p = pn.newton_solve_lanes(
        X, W, c, nn, fmini, jnp.zeros((L,), f32),
        states[0].kernel.theta[0], lbs, ubs, xstarts,
        kind=kind, rule="EI", iterations=8,
        f_tol=rule.solve_f_tol, x_tol=rule.solve_x_tol, interpret=True,
    )
    for i, st in enumerate(states):
        xs, vals = solvers.newton_solve_batch(
            st, rule, theta, lbs, ubs, xstarts, iterations=8)
        vbest = float(jnp.max(vals))
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        np.testing.assert_allclose(float(vs_p[i]), v_cross,
                                   rtol=2e-3, atol=1e-6)
        # loose acceptance freezes both sides at the same iteration up to
        # f32 threshold noise; the kernel may not end strictly better, but
        # must be within the acceptance tolerance of the XLA winner
        assert v_cross >= vbest - rule.solve_f_tol * (abs(vbest) + 1.0)


def test_pallas_enabled_for_f64_loose_poi_when_forced():
    """The f64 + solve_f_tol POI configuration routes to the kernel when
    the mode is forced (interpret/CPU here; mode "1" on a chip)."""
    states = _random_states_f64(1, 5, 2, 8, "matern52", seed=1)
    old = solvers._PALLAS_MODE
    try:
        solvers._PALLAS_MODE = "interpret"
        assert solvers.pallas_enabled(states[0], dr.POI())
        solvers._PALLAS_MODE = "auto"
        # auto on CPU still prefers the XLA path
        assert not solvers.pallas_enabled(states[0], dr.POI())
    finally:
        solvers._PALLAS_MODE = old


def test_maximize_hot_pallas_f64_loose_route():
    """maximize_hot through the kernel (interpret) == XLA route for the
    f64 loose-POI configuration."""
    states = _random_states_f64(1, 6, 2, 9, "matern52", seed=8)
    st = states[0]
    lbs, ubs = np.full(2, -1.0), np.full(2, 1.0)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(3, lbs, ubs), f64)
    rule = dr.POI()
    theta = jnp.zeros((1,), f64)
    old = solvers._PALLAS_MODE
    try:
        solvers._PALLAS_MODE = "0"
        x_x, v_x = solvers.maximize_hot(
            st, rule, theta, lbs, ubs, xstarts, iterations=8)
        solvers._PALLAS_MODE = "interpret"
        x_p, v_p = solvers.maximize_hot(
            st, rule, theta, lbs, ubs, xstarts, iterations=8)
    finally:
        solvers._PALLAS_MODE = old
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x),
                               rtol=1e-5, atol=1e-7)


def test_pallas_periodic_kernel_matches_xla():
    """Periodic-kernel lanes (theta = (lengthscale, period)) vs the XLA
    solver — closes the last kernel-family coverage hole."""
    L, n, d, cap, S = 4, 7, 2, 12, 4
    rng = np.random.default_rng(17)
    # period 3.0 > the domain diagonal (2*sqrt(2)): no aliasing, so the
    # f32 kernel matrix stays well-conditioned (period < domain width
    # makes points a full period apart perfectly correlated -> singular K)
    kern = K.periodic((0.9, 3.0))
    states = []
    for _ in range(L):
        Xs = rng.uniform(-1.0, 1.0, (n, d))
        ys = np.sin(2.0 * Xs.sum(axis=1)) + 0.2 * rng.standard_normal(n)
        states.append(sg.fit(kern, Xs, ys, capacity=cap, noise=1e-4,
                             dtype=f32))
    X, W, c, nn, fmini = _pack(states)
    lbs, ubs = np.full(d, -1.0), np.full(d, 1.0)
    xstarts = qmc.generate_initial_guesses(S - 2, lbs, ubs).astype(np.float32)
    rule = dr.EI()
    theta = jnp.zeros((1,), f32)

    xs_p, vs_p = pn.newton_solve_lanes(
        X, W, c, nn, fmini, jnp.zeros((L,), f32),
        states[0].kernel.theta[0], lbs, ubs, xstarts,
        states[0].kernel.theta[1],
        kind="periodic", rule="EI", iterations=8, interpret=True,
    )
    for i, st in enumerate(states):
        xs, vals = solvers.newton_solve_batch(
            st, rule, theta, lbs, ubs, xstarts, iterations=8)
        vbest = float(jnp.max(vals))
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        np.testing.assert_allclose(float(vs_p[i]), v_cross,
                                   rtol=2e-3, atol=1e-5)
        assert v_cross >= vbest - 1e-3 * max(1.0, abs(vbest))


def test_pallas_enabled_periodic_theta_shape():
    """pallas_enabled accepts periodic states (theta (2,)) and still
    rejects mismatched hyperparameter shapes."""
    rng = np.random.default_rng(3)
    Xs = rng.uniform(-1.0, 1.0, (5, 2))
    ys = rng.standard_normal(5)
    st_p = sg.fit(K.periodic((0.9, 3.0)), Xs, ys, capacity=8, noise=1e-4,
                  dtype=f32)
    old = solvers._PALLAS_MODE
    try:
        solvers._PALLAS_MODE = "interpret"
        assert solvers.pallas_enabled(st_p, dr.EI())
    finally:
        solvers._PALLAS_MODE = old

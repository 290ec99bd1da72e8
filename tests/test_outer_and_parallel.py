"""Outer SGA solve + sharded execution on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.parallel import mesh as mesh_mod
from rollout_bo_tpu.parallel import sharded
from rollout_bo_tpu.rollout import mc, outer
from rollout_bo_tpu.rollout.trajectory import TrajectoryParams


def base_state(n=6, seed=0, cap=12):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0.0, 1.0, size=(n, 1)), axis=0)
    y = np.sin(6 * X[:, 0]) + 0.3 * X[:, 0]
    return sg.fit(K.matern52((0.3,)), X, y, capacity=cap, noise=1e-6)


def make_tp(st, M=8, h=1, seed=3, x0=(0.52,)):
    z = np.random.default_rng(seed).normal(size=(M, 2, h + 1))
    return TrajectoryParams(
        x0=jnp.asarray(x0, st.X.dtype),
        theta=jnp.asarray([0.0], st.X.dtype),
        lbs=jnp.asarray([0.0], st.X.dtype),
        ubs=jnp.asarray([1.0], st.X.dtype),
        rnstream=jnp.asarray(z, st.X.dtype),
    )


def test_eswavs_statistic():
    g = jnp.asarray([1.0, 1.0])
    assert not bool(outer.eswavs(g, jnp.asarray([0.01, 0.01]), 16))
    assert bool(outer.eswavs(jnp.asarray([1e-4, 1e-4]), jnp.asarray([10.0, 10.0]), 4))


def test_adam_matches_reference_semantics():
    x = jnp.asarray([0.0])
    st = outer.adam_init(x)
    g = jnp.asarray([2.0])
    st, x1 = outer.adam_update(st, x, g, lr=0.1)
    # first step of Adam moves by ~lr in the gradient direction
    np.testing.assert_allclose(float(x1[0]), 0.1, rtol=1e-5)


def test_stochastic_solve_improves_value():
    st = base_state()
    tp = make_tp(st, M=8, h=1)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(6, [0.0], [1.0]))
    rule = dr.EI()
    start = jnp.asarray([0.35])

    v0 = mc.simulate_trajectory_mc(st, tp._replace(x0=start), rule, xstarts,
                                   with_gradients=False, iterations=15)
    xf, eto = outer.stochastic_solve(st, tp, rule, xstarts, start,
                                     max_iters=15, lr=0.05, inner_iterations=15)
    assert 0.0 <= float(xf[0]) <= 1.0
    assert float(eto.mu) >= float(v0.mu) - 1e-6


def test_stochastic_solve_batch_shapes():
    st = base_state()
    tp = make_tp(st, M=4, h=1)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, [0.0], [1.0]))
    starts = np.array([[0.2], [0.5], [0.8], [0.95]])
    xs, vals = outer.stochastic_solve_batch(
        st, tp, dr.EI(), xstarts, starts, max_iters=5, inner_iterations=10)
    assert xs.shape == (4, 1) and vals.shape == (4,)
    assert np.all(np.isfinite(np.asarray(vals)))


def test_sharded_simulate_matches_unsharded():
    assert len(jax.devices()) == 8
    st = base_state()
    tp = make_tp(st, M=16, h=1)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(6, [0.0], [1.0]))
    rule = dr.EI()
    ref = mc.simulate_trajectory_mc(st, tp, rule, xstarts, iterations=15)
    mesh = mesh_mod.make_mesh(restarts=1)
    out = sharded.sharded_simulate_mc(st, tp, rule, xstarts, mesh, iterations=15)
    # cross-shard reduction order differs; agreement to ~1e-6 relative
    np.testing.assert_allclose(float(out.mu), float(ref.mu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.grad_x), np.asarray(ref.grad_x), rtol=1e-5)
    np.testing.assert_allclose(float(out.std_mu), float(ref.std_mu), rtol=1e-5)


def test_sharded_restart_solve_matches_unsharded():
    st = base_state()
    tp = make_tp(st, M=4, h=1)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, [0.0], [1.0]))
    starts = np.linspace(0.1, 0.9, 8)[:, None]
    rule = dr.EI()
    xs_ref, vals_ref = outer.stochastic_solve_batch(
        st, tp, rule, xstarts, starts, max_iters=3, inner_iterations=10)
    mesh = mesh_mod.make_mesh(restarts=8, mc=1)
    xs, vals = sharded.sharded_stochastic_solve_batch(
        st, tp, rule, xstarts, starts, mesh, max_iters=3, inner_iterations=10)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref), rtol=1e-6, atol=1e-10)


def test_sharded_scanned_solve_matches_unsharded():
    """The scanned production program sharded over restarts x mc must agree
    with the single-device scanned solver (GSPMD only changes placement)."""
    st = base_state()
    tp = make_tp(st, M=8, h=1)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, [0.0], [1.0]))
    starts = np.linspace(0.1, 0.9, 4)[:, None]
    rule = dr.EI()
    xs_ref, vals_ref = outer.stochastic_solve_scanned(
        st, tp, rule, xstarts, starts,
        max_iters=4, steps_per_call=2, inner_iterations=10)
    mesh = mesh_mod.make_mesh(restarts=4, mc=2)
    xs, vals = sharded.sharded_stochastic_solve_scanned(
        st, tp, rule, xstarts, starts, mesh,
        max_iters=4, steps_per_call=2, inner_iterations=10)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ref), rtol=1e-6, atol=1e-10)


def test_nonmyopic_bo_scanned_smoke():
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.rollout import bo
    f = testfns.gramacylee()
    res = bo.run_nonmyopic_bo(
        f, horizon=1, mc_iters=4, budget=2, num_starts=4, num_restarts=2,
        sgd_iters=4, seed=5, solver_iterations=8,
        outer_solver="scanned", steps_per_call=2)
    assert res.y.shape == (7,)
    assert np.all(np.isfinite(res.y))


def test_nonmyopic_bo_smoke():
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.rollout import bo
    f = testfns.gramacylee()
    res = bo.run_nonmyopic_bo(
        f, horizon=1, mc_iters=4, budget=3, num_starts=4, num_restarts=2,
        sgd_iters=3, seed=5, solver_iterations=8)
    assert res.y.shape == (8,)
    assert np.all(np.isfinite(res.y))
    assert np.all(res.X[5:] >= f.lbs - 1e-9) and np.all(res.X[5:] <= f.ubs + 1e-9)

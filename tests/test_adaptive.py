"""Adaptive-horizon driver + deterministic (SAA) outer solve tests.

reference: experiments/adaptive_bayesopt.jl (schedule :505, failure
capture :492-542) and utils.jl:267-306 (deterministic_solve).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models import testfns
from rollout_bo_tpu.models.decision_rules import EI
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout import bo, outer


def test_horizon_schedules():
    alt = bo.alternating_horizon(2)
    assert [alt(b, 6) for b in range(6)] == [0, 2, 0, 2, 0, 2]
    tr = bo.truncated_horizon(3)
    assert [tr(b, 5) for b in range(5)] == [3, 3, 2, 1, 0]


def _small_state(f, n=4, cap=12, seed=0):
    rng = np.random.default_rng(seed)
    X = qmc.randsample(n, f.dim, f.lbs, f.ubs, rng)
    y = np.asarray(f.batch(X))
    return sg.fit(K.matern52((0.7,)), X, y, capacity=cap, noise=1e-6)


def test_deterministic_solve_batch_finite():
    f = testfns.get_function("sixhump")
    state = _small_state(f)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, f.lbs, f.ubs),
                          state.X.dtype)
    starts = jnp.asarray(qmc.generate_batch(3, f.lbs, f.ubs)[:3], state.X.dtype)
    xs, vals = outer.deterministic_solve_batch(
        state, jnp.asarray([0.0]), jnp.asarray(f.lbs), jnp.asarray(f.ubs),
        xstarts, starts, EI(), horizon=1, num_nodes=3, max_iters=2,
        inner_iterations=4,
    )
    assert xs.shape == (3, f.dim)
    assert np.all(np.isfinite(np.asarray(xs)))
    assert np.all(np.isfinite(np.asarray(vals)))
    lo, hi = np.asarray(f.lbs), np.asarray(f.ubs)
    assert np.all(np.asarray(xs) >= lo - 1e-9) and np.all(np.asarray(xs) <= hi + 1e-9)


@pytest.mark.parametrize("deterministic", [False, True])
def test_run_adaptive_bo_smoke(deterministic):
    f = testfns.get_function("sixhump")
    res = bo.run_adaptive_bo(
        f, horizon=1, mc_iters=4, budget=3, num_starts=4, num_restarts=2,
        sgd_iters=2, seed=7, n_init=2, deterministic=deterministic,
        ghq_nodes=3, solver_iterations=4,
    )
    assert res.y.shape == (5,)
    assert np.all(np.isfinite(res.y))
    assert res.gaps.shape == (3,)
    assert res.allocations.shape == (3,)
    # minimum observations are monotone nonincreasing
    assert np.all(np.diff(res.minimum_observations) <= 1e-12)


def test_adaptive_cli_smoke(tmp_path):
    from rollout_bo_tpu.experiments import adaptive

    adaptive.main([
        "--function-name", "sixhump", "--output-dir", str(tmp_path),
        "--trials", "1", "--budget", "2", "--starts", "4",
        "--mc-samples", "4", "--horizon", "1", "--batch-size", "2",
        "--sgd-iterations", "2", "--variance-reduction",
    ])
    outdir = tmp_path / "sixhump"
    for metric in ["gaps", "observations", "times", "allocations"]:
        p = outdir / f"rollout_h1_{metric}.csv"
        assert p.exists()
        rows = p.read_text().strip().splitlines()
        assert len(rows) == 3  # header + -1 sentinel + one trial
    assert not (outdir / "sixhump_failed.txt").exists()
    assert (outdir / "metadata.txt").exists()


def test_adaptive_cli_failure_capture(tmp_path, monkeypatch):
    from rollout_bo_tpu.experiments import adaptive

    def boom(*a, **k):
        raise RuntimeError("synthetic failure")

    monkeypatch.setattr(bo, "run_adaptive_bo", boom)
    adaptive.main([
        "--function-name", "sixhump", "--output-dir", str(tmp_path),
        "--trials", "1", "--budget", "2", "--function-name", "sixhump",
    ])
    failed = tmp_path / "sixhump" / "sixhump_failed.txt"
    assert failed.exists()
    assert "synthetic failure" in failed.read_text()


def test_stepped_matches_fused_batch():
    """Host-chained SGA (stochastic_solve_stepped) must agree with the
    fused on-device while-loop (stochastic_solve_batch)."""
    import jax.numpy as jnp

    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function("sixhump")
    state = _small_state(f)
    dt = state.X.dtype
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, f.lbs, f.ubs), dt)
    starts = jnp.asarray(qmc.generate_batch(3, f.lbs, f.ubs)[:3], dt)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(6, f.dim, 2), dt)
    tp = TrajectoryParams(
        x0=jnp.zeros((f.dim,), dt), theta=jnp.asarray([0.0], dt),
        lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt), rnstream=z,
    )
    kw = dict(max_iters=4, lr=0.05, inner_iterations=4)
    xs_b, vals_b = outer.stochastic_solve_batch(
        state, tp, EI(), xstarts, starts, **kw)
    xs_s, vals_s = outer.stochastic_solve_stepped(
        state, tp, EI(), xstarts, starts, sync_every=2, **kw)
    np.testing.assert_allclose(np.asarray(xs_s), np.asarray(xs_b),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_b),
                               rtol=1e-6, atol=1e-8)


def test_scanned_matches_stepped():
    """k-iterations-per-dispatch SGA (stochastic_solve_scanned) must agree
    exactly with the one-dispatch-per-iteration loop it replaces."""
    import jax.numpy as jnp

    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function("sixhump")
    state = _small_state(f)
    dt = state.X.dtype
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, f.lbs, f.ubs), dt)
    starts = jnp.asarray(qmc.generate_batch(3, f.lbs, f.ubs)[:3], dt)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(6, f.dim, 2), dt)
    tp = TrajectoryParams(
        x0=jnp.zeros((f.dim,), dt), theta=jnp.asarray([0.0], dt),
        lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt), rnstream=z,
    )
    kw = dict(max_iters=4, lr=0.05, inner_iterations=4)
    xs_s, vals_s = outer.stochastic_solve_stepped(
        state, tp, EI(), xstarts, starts, sync_every=2, **kw)
    xs_k, vals_k = outer.stochastic_solve_scanned(
        state, tp, EI(), xstarts, starts, steps_per_call=2, **kw)
    np.testing.assert_allclose(np.asarray(xs_k), np.asarray(xs_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vals_k), np.asarray(vals_s),
                               rtol=1e-6, atol=1e-8)


def test_fused_matches_stepped():
    """One-dispatch while_loop SGA (stochastic_solve_fused) must agree with
    the host-chained loop it replaces (exact early-exit semantics: frozen
    restarts do not move, so stopping the loop once all are done cannot
    change the final points or values)."""
    import jax.numpy as jnp

    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function("sixhump")
    state = _small_state(f)
    dt = state.X.dtype
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, f.lbs, f.ubs), dt)
    starts = jnp.asarray(qmc.generate_batch(3, f.lbs, f.ubs)[:3], dt)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(6, f.dim, 2), dt)
    tp = TrajectoryParams(
        x0=jnp.zeros((f.dim,), dt), theta=jnp.asarray([0.0], dt),
        lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt), rnstream=z,
    )
    kw = dict(max_iters=4, lr=0.05, inner_iterations=4)
    xs_s, vals_s = outer.stochastic_solve_stepped(
        state, tp, EI(), xstarts, starts, sync_every=2, **kw)
    xs_f, vals_f = outer.stochastic_solve_fused(
        state, tp, EI(), xstarts, starts, **kw)
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_s),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vals_f), np.asarray(vals_s),
                               rtol=1e-6, atol=1e-8)


def test_fused_select_best_matches_host_argmax():
    """select_best=True moves winner selection on device; must equal the
    host-side argmax over the (xs, vals) the same program returns."""
    import jax.numpy as jnp

    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function("sixhump")
    state = _small_state(f)
    dt = state.X.dtype
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, f.lbs, f.ubs), dt)
    starts = jnp.asarray(qmc.generate_batch(3, f.lbs, f.ubs)[:3], dt)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(6, f.dim, 2), dt)
    tp = TrajectoryParams(
        x0=jnp.zeros((f.dim,), dt), theta=jnp.asarray([0.0], dt),
        lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt), rnstream=z,
    )
    kw = dict(max_iters=3, lr=0.05, inner_iterations=4)
    xs, vals = outer.stochastic_solve_fused(
        state, tp, EI(), xstarts, starts, **kw)
    prog = outer.make_fused_sga_program(
        state, tp, EI(), xstarts, select_best=True, **kw)
    xb, vb = prog(state, tp.rnstream, starts)
    j = int(np.argmax(np.asarray(vals)))
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xs)[j],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(vb), float(np.asarray(vals)[j]),
                               rtol=1e-6, atol=1e-8)


def test_cost_aware_rule_derivatives_and_rollout():
    """CostAwareRule: alpha/c value, quotient-rule grad/Hess vs autodiff,
    and the full rollout stack (inner solve + MC simulate + gradient)
    accepting it unchanged. Goes beyond the reference, whose cost-aware
    acquisition is aspirational (cost_functions.jl:46-47, README.md:21-26)."""
    import jax
    import jax.numpy as jnp

    from rollout_bo_tpu.models import cost_functions as cf
    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.rollout import mc as mc_mod
    from rollout_bo_tpu.rollout import solvers
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function("sixhump")
    state = _small_state(f)
    dt = state.X.dtype
    cost = cf.NonUniformCost(lambda x: 2.0 + jnp.sum((x - 0.5) ** 2))
    rule = cf.cost_aware(EI(), cost)
    assert rule.name == "EI"
    theta = jnp.asarray([0.0], dt)
    x = jnp.asarray([0.4, -0.3], dt)

    # value = base alpha / cost
    a_base = sg.acquisition(state, EI(), x, theta)
    a_cw = sg.acquisition(state, rule, x, theta)
    np.testing.assert_allclose(float(a_cw), float(a_base) / float(cost(x)),
                               rtol=1e-12)

    # quotient-rule grad/Hess vs autodiff of the composed scalar
    a, g, H = sg.acquisition_value_grad_hess(state, rule, x, theta)
    g_ad = jax.grad(lambda xv: sg.acquisition(state, rule, xv, theta))(x)
    H_ad = jax.hessian(lambda xv: sg.acquisition(state, rule, xv, theta))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad),
                               rtol=1e-7, atol=1e-10)
    a2, g2 = sg.acquisition_grad(state, rule, x, theta)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_ad),
                               rtol=1e-8, atol=1e-12)

    # the Pallas hot path must reject cost-aware rules
    assert not solvers.pallas_enabled(state, rule)

    # log-scale rule: cost enters as a SUBTRACTED log (dividing the
    # negative log value would invert the cost preference), and the
    # cheap point must beat the expensive one at equal base acquisition
    from rollout_bo_tpu.models.decision_rules import LCB, LogEI

    lrule = cf.cost_aware(LogEI(), cost)
    la_base = sg.acquisition(state, LogEI(), x, theta)
    la_cw = sg.acquisition(state, lrule, x, theta)
    np.testing.assert_allclose(
        float(la_cw), float(la_base) - float(jnp.log(cost(x))), rtol=1e-10)
    lg_ad = jax.grad(lambda xv: sg.acquisition(state, lrule, xv, theta))(x)
    _, lg, lH = sg.acquisition_value_grad_hess(state, lrule, x, theta)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_ad),
                               rtol=1e-8, atol=1e-12)
    lH_ad = jax.hessian(lambda xv: sg.acquisition(state, lrule, xv, theta))(x)
    np.testing.assert_allclose(np.asarray(lH), np.asarray(lH_ad),
                               rtol=1e-7, atol=1e-10)

    # signed non-log rules and double composition are rejected
    import pytest

    with pytest.raises(ValueError):
        cf.cost_aware(LCB(), cost)
    with pytest.raises(ValueError):
        cf.cost_aware(rule, cost)

    # inner multistart solve accepts it and lands where alpha/c is best
    xstarts = jnp.asarray(qmc.generate_initial_guesses(6, f.lbs, f.ubs), dt)
    res = solvers.multistart_maximize(
        state, rule, theta, jnp.asarray(f.lbs, dt), jnp.asarray(f.ubs, dt),
        xstarts, iterations=8)
    assert np.all(np.isfinite(np.asarray(res.x)))

    # full rollout acquisition + gradient under the cost-aware base policy
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(6, f.dim, 2), dt)
    tp = TrajectoryParams(
        x0=jnp.asarray([0.1, 0.2], dt), theta=theta,
        lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt), rnstream=z,
    )
    eto = mc_mod.simulate_trajectory_mc(state, tp, rule, xstarts,
                                        with_gradients=True, iterations=6)
    assert np.isfinite(float(eto.mu))
    assert np.all(np.isfinite(np.asarray(eto.grad_x)))


def test_cost_functions():
    """Cost models + cost-weighted acquisition (reference cost_functions.jl)."""
    import jax.numpy as jnp

    from rollout_bo_tpu.models import cost_functions as cf
    from rollout_bo_tpu.models import surrogate as sg

    u = cf.UnitCost()
    x = jnp.asarray([0.3, -0.2])
    assert float(u(x)) == 1.0
    assert np.allclose(np.asarray(u.grad(x)), 0.0)

    nu = cf.NonUniformCost(lambda x: 1.0 + jnp.sum(x**2))
    assert float(nu(x)) > 1.0
    np.testing.assert_allclose(np.asarray(nu.grad(x)), 2 * np.asarray(x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(nu.hess(x)), 2 * np.eye(2), rtol=1e-12)

    f = testfns.get_function("sixhump")
    state = _small_state(f)
    gpc = cf.GaussianProcessCost(state)
    assert float(gpc(x)) > 0.0

    rule = EI()
    wa = cf.cost_weighted_rule(rule, nu)
    a = sg.acquisition(state, rule, x, jnp.asarray([0.0]))
    assert np.isclose(float(wa(state, x, jnp.asarray([0.0]))),
                      float(a) / float(nu(x)))


def test_nonmyopic_checkpoint_resume(tmp_path):
    """A non-myopic trial interrupted mid-run resumes from its snapshot and
    matches an uninterrupted run exactly (the QMC streams and Sobol restart
    batches are stateless, so only the surrogate + metrics need restoring)."""
    f = testfns.get_function("sixhump")
    x_init = qmc.randsample(3, f.dim, f.lbs, f.ubs, np.random.default_rng(5))
    kw = dict(horizon=1, mc_iters=4, num_starts=4, num_restarts=2,
              sgd_iters=2, seed=13, x_init=x_init, solver_iterations=4)

    full = bo.run_nonmyopic_bo(f, budget=4, **kw)

    ck = str(tmp_path / "nm_ck")
    bo.run_nonmyopic_bo(f, budget=2, checkpoint_path=ck,
                        checkpoint_every=2, **kw)
    res = bo.run_nonmyopic_bo(f, budget=4, checkpoint_path=ck,
                              checkpoint_every=2, **kw)
    np.testing.assert_allclose(res.y, full.y, rtol=1e-10)
    np.testing.assert_allclose(res.gaps, full.gaps, rtol=1e-10)


def test_myopic_checkpoint_resume(tmp_path):
    """A trial interrupted mid-run resumes from its snapshot and matches an
    uninterrupted run exactly (same PRNG stream reconstruction)."""
    f = testfns.get_function("sixhump")
    x_init = qmc.randsample(3, f.dim, f.lbs, f.ubs, np.random.default_rng(2))

    full = bo.run_myopic_bo(
        f, EI(), budget=6, num_starts=4, seed=11, x_init=x_init,
        solver_iterations=4,
    )

    ck = str(tmp_path / "ck")
    # phase 1: snapshot every 2 iterations, "crash" by monkey truncation —
    # emulate by running only 4 iterations via a snapshot then restarting
    bo.run_myopic_bo(
        f, EI(), budget=4, num_starts=4, seed=11, x_init=x_init,
        solver_iterations=4, checkpoint_path=ck, checkpoint_every=2,
    )
    # phase 2: resume with the full budget; iterations 0..3 come from the
    # snapshot (taken at iteration 4), 4..5 run live
    res = bo.run_myopic_bo(
        f, EI(), budget=6, num_starts=4, seed=11, x_init=x_init,
        solver_iterations=4, checkpoint_path=ck, checkpoint_every=2,
    )
    np.testing.assert_allclose(res.y, full.y, rtol=1e-10)
    np.testing.assert_allclose(res.gaps, full.gaps, rtol=1e-10)

"""Explicit adjoint (rollout/adjoint.py) vs autodiff and finite differences.

The reference validates its hand-rolled adjoint against FD of the MC
estimate under common random numbers (notebooks/explanatory.ipynb cells
10-12). Here the explicit back-substitution must agree with
jax.grad(trajectory_reward) in draw_mode="sample_path" (identical
semantics by construction) and, averaged over samples, with centered FD
of the fixed-stream MC value.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollout_bo_tpu.models import fantasy as fant
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import EI
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout import adjoint as adj
from rollout_bo_tpu.rollout import trajectory as traj


def _setup(d=2, n=7, cap=14, h=2, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1.0, 1.0, size=(n, d))
    y = np.sum(X**2, axis=1) + 0.1 * np.sin(3 * X[:, 0])
    state = sg.fit(K.matern52((0.6,)), X, y, capacity=cap, noise=1e-6)
    lbs, ubs = jnp.full((d,), -1.0), jnp.full((d,), 1.0)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(6, [-1.0] * d, [1.0] * d))
    theta = jnp.asarray([0.0])
    return state, lbs, ubs, xstarts, theta, h, rng


@pytest.mark.parametrize("seed_z", [0, 1, 2, 5])
def test_adjoint_matches_autodiff_sample_path(seed_z):
    state, lbs, ubs, xstarts, theta, h, _ = _setup()
    d = state.dim
    rng = np.random.default_rng(100 + seed_z)
    z = jnp.asarray(rng.normal(size=(d + 1, h + 1)))
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, size=(d,)))
    fs0 = fant.make_fantasy(state, h)

    # autodiff route (sample-path draw semantics)
    def reward(x0_, th_):
        return traj.trajectory_reward(
            fs0, x0_, th_, lbs, ubs, xstarts, z, EI(),
            iterations=20, draw_mode="sample_path",
        )

    r, (gx_ad, gth_ad) = jax.value_and_grad(reward, argnums=(0, 1))(x0, theta)

    # explicit adjoint on the same rolled-out trajectory
    fs_final, rec = traj.rollout_trajectory(
        fs0, x0, theta, lbs, ubs, xstarts, z, EI(),
        iterations=20, draw_mode="sample_path",
    )
    gx_adj, gth_adj = adj.gradient_adjoint(fs_final, rec, EI(), theta)

    t = int(jnp.argmin(rec.ys))
    improved = float(r) > 0.0
    if improved and t >= 1:
        # interior-solve case: both routes run the full back-substitution.
        # They may legitimately differ when an inner argmax is pinned to
        # the box boundary (the IFT zeroes those coordinates); check the
        # solves are interior before demanding agreement.
        interior = np.all(
            (np.asarray(rec.xs[1:]) > np.asarray(lbs) + 1e-6)
            & (np.asarray(rec.xs[1:]) < np.asarray(ubs) - 1e-6)
        )
        if interior:
            np.testing.assert_allclose(np.asarray(gx_adj), np.asarray(gx_ad),
                                       rtol=2e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(gth_adj), np.asarray(gth_ad),
                                       rtol=2e-5, atol=1e-7)
    else:
        # degenerate cases must agree exactly (0 or -drawn gradient)
        np.testing.assert_allclose(np.asarray(gx_adj), np.asarray(gx_ad),
                                   rtol=1e-6, atol=1e-9)


def test_adjoint_case_no_improvement_is_zero():
    state, lbs, ubs, xstarts, theta, h, rng = _setup(seed=7)
    d = state.dim
    fs0 = fant.make_fantasy(state, h)
    x0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(d,)))
    z = jnp.asarray(rng.normal(size=(d + 1, h + 1)))
    fs_final, rec = traj.rollout_trajectory(
        fs0, x0, theta, lbs, ubs, xstarts, z, EI(), draw_mode="sample_path")
    # force the "no improvement" branch by raising every fantasy y
    rec_bad = rec._replace(ys=rec.ys + 1e3)
    gx, gth = adj.gradient_adjoint(fs_final, rec_bad, EI(), theta)
    np.testing.assert_array_equal(np.asarray(gx), np.zeros(d))
    np.testing.assert_array_equal(np.asarray(gth), np.zeros(theta.shape))


def test_adjoint_matches_fd_deterministic_observable():
    """Ground-truth observable: sample-path semantics are *exact* (the
    "sample path" IS the objective), so the explicit adjoint must match
    centered FD of the rollout reward to FD accuracy. This closes the
    validation triangle FD <-> autodiff <-> explicit adjoint the reference
    establishes with its DeterministicObservable (observables.jl:126-152)."""
    from rollout_bo_tpu.rollout import observables as obs
    from rollout_bo_tpu.rollout.trajectory import rollout_core

    state, lbs, ubs, xstarts, theta, h, _ = _setup(d=2, n=7, cap=14, h=2, seed=5)
    d = state.dim

    def f(x):
        return jnp.sum(x**2) + 0.3 * jnp.sin(4.0 * x[0])

    fs0 = fant.make_fantasy(state, h)
    draw = obs.deterministic_observable(f)

    def reward(x0_):
        fmini = traj.base_fmini(fs0)
        _, rec = rollout_core(
            fs0, x0_, theta, lbs, ubs, xstarts, EI(), draw, h, iterations=20)
        return jnp.maximum(fmini - jnp.min(rec.ys), 0.0), rec

    x0 = jnp.asarray([0.41, -0.23])
    r0, rec = reward(x0)
    fs_final, _ = rollout_core(
        fs0, x0, theta, lbs, ubs, xstarts, EI(), draw, h, iterations=20)
    gx, _ = adj.gradient_adjoint(fs_final, rec, EI(), theta)

    if float(r0) > 1e-10 and int(jnp.argmin(rec.ys)) >= 1:
        interior = np.all(
            (np.asarray(rec.xs[1:]) > np.asarray(lbs) + 1e-6)
            & (np.asarray(rec.xs[1:]) < np.asarray(ubs) - 1e-6))
        if interior:
            eps = 1e-6
            for k in range(d):
                e = jnp.zeros(d).at[k].set(eps)
                fp, _ = reward(x0 + e)
                fm, _ = reward(x0 - e)
                fd = (float(fp) - float(fm)) / (2 * eps)
                np.testing.assert_allclose(float(gx[k]), fd, rtol=5e-4, atol=1e-7)
    # at minimum the adjoint must be finite and zero iff no improvement
    assert np.all(np.isfinite(np.asarray(gx)))

"""Non-myopic rollout BO end to end: the block-triangular adjoint in action.

Script analog of the reference's `/root/reference/notebooks/rollout_bo.ipynb`
("Differentiating Policies for Non-Myopic Rollout Bayesian Optimization").
That notebook derives — in math, its one code cell is empty — the forward
system of an h-step rollout trajectory

    r_j(x_j; x_0, y_0, ..., x_{j-1}, y_{j-1}, theta) = 0   (inner argmax)
    f(x_j) - y_j = 0                                        (observation)

and its adjoint: the variations solve the block-lower-triangular system
L v = -q dtheta - g dx0, so dy_t/dx0 = -e_m^T L^{-1} g and
dy_t/dtheta = -e_m^T L^{-1} q. This script RUNS that math:

1. evaluate the h-step rollout acquisition and its adjoint gradient
   (d/dx0 and d/dtheta) at a batch of points — the triangular solve is
   the implicit-function rule on each inner argmax plus reverse-mode
   through the trajectory scan (rollout/trajectory.py), and the explicit
   dual back-substitution (rollout/adjoint.py) cross-checks one sample;
2. ascend the acquisition with multi-restart SGA (the fused one-dispatch
   program) and run a short non-myopic BO loop, reporting the gap curve
   vs the myopic EI baseline on the same seed.

Run:  python examples/rollout_bo.py [--function-name gramacylee]
      [--horizon 2] [--mc 32] [--budget 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--function-name", default="gramacylee")
    p.add_argument("--horizon", type=int, default=2)
    p.add_argument("--mc", type=int, default=32)
    p.add_argument("--budget", type=int, default=8)
    p.add_argument("--n-init", type=int, default=4)
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.models import fantasy as fant
    from rollout_bo_tpu.rollout import adjoint as adj
    from rollout_bo_tpu.rollout import bo
    from rollout_bo_tpu.rollout import mc as mc_mod
    from rollout_bo_tpu.rollout import outer as outer_mod
    from rollout_bo_tpu.rollout import trajectory as traj
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function(args.function_name)
    d, h = f.dim, args.horizon
    rng = np.random.default_rng(args.seed)
    X0 = qmc.randsample(args.n_init, d, f.lbs, f.ubs, rng)
    y0 = np.asarray(f.batch(X0))
    state = sg.fit(K.matern52((0.5,)), X0, y0,
                   capacity=args.n_init + args.budget + 1, noise=1e-6)
    dt = state.X.dtype

    xstarts = jnp.asarray(qmc.generate_initial_guesses(6, f.lbs, f.ubs), dt)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(args.mc, d, h + 1), dt)
    tp = TrajectoryParams(
        x0=jnp.zeros((d,), dt), theta=jnp.asarray([0.0], dt),
        lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt), rnstream=z,
    )
    rule = EI()

    # -- 1) acquisition surface + adjoint gradients ------------------------
    print(f"== {args.function_name}: h={h} rollout acquisition and its "
          f"adjoint gradient ({args.mc} QMC trajectories) ==")
    print(f"{'x0':>22}  {'alpha_h(x0)':>12}  {'d alpha/dx0':>22}  {'d alpha/dtheta':>14}")
    probe = np.linspace(f.lbs, f.ubs, 7)[1:-1]
    for xv in probe:
        eto = mc_mod.simulate_trajectory_mc(
            state, tp._replace(x0=jnp.asarray(xv, dt)), rule, xstarts,
            with_gradients=True, iterations=10,
        )
        xs = np.array2string(np.asarray(xv), precision=3)
        gs = np.array2string(np.asarray(eto.grad_x), precision=4)
        print(f"{xs:>22}  {float(eto.mu):>12.6f}  {gs:>22}"
              f"  {float(np.asarray(eto.grad_theta)[0]):>14.6f}")

    # cross-check the autodiff gradient against the explicit dual
    # back-substitution (the notebook's block-triangular L^{-1} system) on
    # one sample path under identical (sample_path) draw semantics
    x_probe = jnp.asarray(probe[len(probe) // 2], dt)
    z1 = z[0]  # one trajectory's (d+1, h+1) stream
    fs0 = fant.make_fantasy(state, h)
    r, (gx_ad, gth_ad) = jax.value_and_grad(
        lambda x0_, th_: traj.trajectory_reward(
            fs0, x0_, th_, tp.lbs, tp.ubs, xstarts, z1, rule,
            iterations=10, draw_mode="sample_path"),
        argnums=(0, 1))(x_probe, tp.theta)
    fs_final, rec = traj.rollout_trajectory(
        fs0, x_probe, tp.theta, tp.lbs, tp.ubs, xstarts, z1, rule,
        iterations=10, draw_mode="sample_path")
    gx_adj, gth_adj = adj.gradient_adjoint(fs_final, rec, rule, tp.theta)
    den = max(float(np.max(np.abs(np.asarray(gx_ad)))), 1e-12)
    err = float(np.max(np.abs(np.asarray(gx_adj) - np.asarray(gx_ad)))) / den
    print(f"\nexplicit dual back-substitution vs autodiff-of-scan gradient "
          f"(one sample path): max rel err {err:.3e}")

    # -- 2) SGA ascent + short non-myopic BO loop --------------------------
    restarts = jnp.asarray(qmc.generate_batch(4, f.lbs, f.ubs)[:4], dt)
    xs_fin, vals = outer_mod.stochastic_solve_fused(
        state, tp, rule, xstarts, restarts, max_iters=15, lr=0.05,
        inner_iterations=10)
    j = int(np.argmax(np.asarray(vals)))
    print(f"\nmulti-restart SGA (fused one-dispatch program): best restart "
          f"alpha={float(np.asarray(vals)[j]):.6f} at "
          f"x={np.array2string(np.asarray(xs_fin)[j], precision=4)}")

    print(f"\n== non-myopic (h={h}) vs myopic EI BO, budget {args.budget} ==")
    res_nm = bo.run_nonmyopic_bo(
        f, budget=args.budget, n_init=args.n_init, seed=args.seed,
        horizon=h, mc_iters=args.mc, num_restarts=4, sgd_iters=15,
    )
    res_my = bo.run_myopic_bo(f, rule, budget=args.budget,
                              n_init=args.n_init, seed=args.seed)
    g_nm = np.asarray(res_nm.gaps)
    g_my = np.asarray(res_my.gaps)
    print(f"rollout gap curve: {np.array2string(g_nm, precision=3)}")
    print(f"myopic  gap curve: {np.array2string(g_my, precision=3)}")
    print(f"final gaps: rollout {float(g_nm[-1]):.4f}  myopic {float(g_my[-1]):.4f}")


if __name__ == "__main__":
    main()

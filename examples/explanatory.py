"""1-D rollout-acquisition sweep: value, adjoint gradient, FD validation.

Script analog of the reference's de-facto integration test
`/root/reference/notebooks/explanatory.ipynb` (cells 10-12): sweep a 1-D
domain, evaluate the h-step Monte-Carlo rollout acquisition with its
adjoint gradient, and compare the gradient against centered finite
differences of the MC estimate under common random numbers (the same
fixed QMC stream on both sides).

Run:  python examples/explanatory.py [--horizon 2] [--mc 64] [--grid 21]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--horizon", type=int, default=2)
    p.add_argument("--mc", type=int, default=64)
    p.add_argument("--grid", type=int, default=21)
    p.add_argument("--eps", type=float, default=1e-4)
    p.add_argument("--function-name", default="gramacylee")
    p.add_argument("--csv", default=None, help="optional output CSV path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import mc as mc_mod
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    f = testfns.get_function(args.function_name)
    d = f.dim
    rng = np.random.default_rng(7)
    X0 = qmc.randsample(4, d, f.lbs, f.ubs, rng)
    y0 = np.asarray(f.batch(X0))
    state = sg.fit(K.matern52((0.5,)), X0, y0, capacity=16, noise=1e-6)
    dt = state.X.dtype

    xstarts = jnp.asarray(qmc.generate_initial_guesses(6, f.lbs, f.ubs), dt)
    z = jnp.asarray(
        qmc.gen_low_discrepancy_sequence(args.mc, d, args.horizon + 1), dt)
    rule = EI()

    @jax.jit
    def estimate(x0):
        tp = TrajectoryParams(
            x0=x0, theta=jnp.asarray([0.0], dt),
            lbs=jnp.asarray(f.lbs, dt), ubs=jnp.asarray(f.ubs, dt),
            rnstream=z,
        )
        out = mc_mod.simulate_trajectory_mc(
            state, tp, rule, xstarts, with_gradients=True, iterations=8,
            draw_mode="reparam",
        )
        return out.mu, out.grad_x

    grid = np.linspace(f.lbs[0], f.ubs[0], args.grid)
    rows = []
    print(f"{'x':>8} {'alpha(x)':>12} {'grad (adjoint)':>15} {'grad (FD of MC)':>16}")
    for x in grid:
        x0 = jnp.asarray([x] * d, dt)
        mu, g = estimate(x0)
        # centered FD under common random numbers (same z stream)
        e = args.eps
        mu_p, _ = estimate(x0.at[0].add(e))
        mu_m, _ = estimate(x0.at[0].add(-e))
        fd = (float(mu_p) - float(mu_m)) / (2 * e)
        rows.append((x, float(mu), float(g[0]), fd))
        print(f"{x:8.3f} {float(mu):12.6f} {float(g[0]):15.6f} {fd:16.6f}")

    arr = np.asarray(rows)
    # agreement where the acquisition is active (nonzero value)
    active = arr[:, 1] > 1e-8
    if active.any():
        err = np.abs(arr[active, 2] - arr[active, 3])
        scale = np.maximum(np.abs(arr[active, 3]), 1e-6)
        print(f"\nmax relative |adjoint - FD| over active points: "
              f"{(err / scale).max():.2e}")
    if args.csv:
        np.savetxt(args.csv, arr, delimiter=",",
                   header="x,alpha,grad_adjoint,grad_fd", comments="")
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()

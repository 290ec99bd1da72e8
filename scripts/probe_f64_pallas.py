"""On-TPU probe: does Mosaic compile the lane kernel's f64 variant?

The f64 lanes are interpret-verified (tests/test_pallas_newton.py); the
TPU VPU has no native f64 ALU, so whether Mosaic lowers the f64 kernel
(via software emulation) or rejects it decides the pallas_enabled gate
for float64 states on real chips (rollout/solvers.py). Prints SUPPORTED
or UNSUPPORTED plus the agreement against the XLA solver when it runs.

Run:  python scripts/probe_f64_pallas.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import decision_rules as dr
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import pallas_newton as pn
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import solvers

    print("backend:", jax.default_backend(), flush=True)
    f64 = jnp.float64
    rng = np.random.default_rng(0)
    n, d, cap, L, S = 7, 3, 12, 4, 4
    kern = K.RBFKernel(theta=jnp.asarray([0.8], f64), kind="matern52")
    states = []
    for _ in range(L):
        X0 = rng.uniform(-1.0, 1.0, (n, d))
        y0 = np.sin(2.0 * X0.sum(axis=1)) + 0.2 * rng.standard_normal(n)
        states.append(sg.fit(kern, X0, y0, capacity=cap, noise=1e-5,
                             dtype=f64))
    X = jnp.stack([s.X for s in states])
    Li = jnp.stack([s.Li for s in states])
    W = jnp.einsum("lji,ljk->lik", Li, Li)
    c = jnp.stack([s.c for s in states])
    nn = jnp.stack([s.n for s in states])
    fmini = jnp.stack([sg.get_active_minimum(s) for s in states])
    lbs, ubs = np.full(d, -1.0), np.full(d, 1.0)
    xstarts = qmc.generate_initial_guesses(S - 2, lbs, ubs)
    rule = dr.POI()

    try:
        xs_p, vs_p = jax.block_until_ready(pn.newton_solve_lanes(
            X, W, c, nn, fmini, jnp.zeros((L,), f64),
            states[0].kernel.theta[0], lbs, ubs, xstarts,
            kind="matern52", rule="POI", iterations=8,
            f_tol=rule.solve_f_tol, x_tol=rule.solve_x_tol,
        ))
    except Exception:
        print("MOSAIC-F64: UNSUPPORTED")
        traceback.print_exc()
        return 0

    print("MOSAIC-F64: SUPPORTED")
    theta = jnp.zeros((1,), f64)
    for i, st in enumerate(states):
        _, vals = solvers.newton_solve_batch(
            st, rule, theta, lbs, ubs, xstarts, iterations=8)
        vbest = float(jnp.max(vals))
        v_cross = float(sg.acquisition(st, rule, xs_p[i], theta))
        print(f"lane {i}: pallas {float(vs_p[i]):.12f} cross {v_cross:.12f} "
              f"xla-best {vbest:.12f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

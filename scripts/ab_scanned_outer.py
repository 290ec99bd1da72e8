"""A/B: per-iteration dispatch vs k-iterations-per-dispatch outer SGA.

Times exactly `--iters` SGA iterations (early stop disabled by forcing the
window count) at the headline-benchmark scale, for the stepped loop, the
scanned program, and the raw device-only lower bound (scanned program
timed without the per-window host sync).

Run:  python scripts/ab_scanned_outer.py [--iters 10] [--k 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import outer as outer_mod
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    dtype = jnp.float32
    f = testfns.get_function("trid10d")
    d = f.dim
    horizon, mc_iters = 3, 200
    n_init, budget = 5, 15
    num_starts, num_restarts = 8, 8

    rng = np.random.default_rng(1906)
    X0 = qmc.randsample(n_init + 7, d, f.lbs, f.ubs, rng)
    y0 = np.asarray(f.batch(X0))
    state = sg.fit(K.matern52((1.0,)), X0, y0, capacity=n_init + budget,
                   noise=1e-5, dtype=dtype)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(num_starts, f.lbs, f.ubs), dtype)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(mc_iters, d, horizon + 1), dtype)
    tp = TrajectoryParams(
        x0=jnp.zeros((d,), dtype),
        theta=jnp.asarray([0.0], dtype),
        lbs=jnp.asarray(f.lbs, dtype),
        ubs=jnp.asarray(f.ubs, dtype),
        rnstream=z,
    )
    rule = EI()
    restarts = jnp.asarray(qmc.generate_batch(num_restarts, f.lbs, f.ubs)[:num_restarts], dtype)

    step = outer_mod.make_batched_sga_step(
        state, tp, rule, xstarts, lr=0.01, inner_iterations=10)
    prog = outer_mod.make_scanned_sga_program(
        state, tp, rule, xstarts, steps_per_call=args.k, lr=0.01,
        inner_iterations=10)

    def run_stepped():
        opt = outer_mod.AdamState(jnp.zeros_like(restarts), jnp.zeros_like(restarts),
                                  jnp.zeros((), jnp.int32))
        carry = (restarts, opt, jnp.zeros((num_restarts,), bool),
                 jnp.zeros((num_restarts,), dtype))
        for _ in range(args.iters):
            carry = step(state, z, carry)
        jax.block_until_ready(carry)
        return carry

    def run_scanned(sync=True):
        opt = outer_mod.AdamState(jnp.zeros_like(restarts), jnp.zeros_like(restarts),
                                  jnp.zeros((), jnp.int32))
        carry = (restarts, opt, jnp.zeros((num_restarts,), bool),
                 jnp.zeros((num_restarts,), dtype))
        for _ in range(-(-args.iters // args.k)):
            carry = prog(state, z, carry)
            if sync:
                np.asarray(carry[2])
        jax.block_until_ready(carry)
        return carry

    # warmup/compile both
    c1 = run_stepped()
    c2 = run_scanned()
    x1, x2 = np.asarray(c1[0]), np.asarray(c2[0])
    print("max |x_stepped - x_scanned| =", float(np.max(np.abs(x1 - x2))))

    for name, fn in (("stepped", run_stepped),
                     ("scanned", run_scanned),
                     ("scanned_nosync", lambda: run_scanned(sync=False))):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"{name:15s}  {args.iters} iters: median {ts[len(ts)//2]*1e3:8.1f} ms "
              f"({ts[0]*1e3:.1f}-{ts[-1]*1e3:.1f})")


if __name__ == "__main__":
    main()

"""A/B: scanned (k-per-dispatch) vs fused (one-dispatch while_loop) outer SGA.

Times the FULL acquisition optimization (early stopping live, exactly as
bench.py runs it) at the headline-benchmark scale for both outer-solve
strategies, and checks their argmax points agree.

Run:  python scripts/ab_fused_outer.py [--reps 5]
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
    p.add_argument("--reps", type=int, default=5)
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
    num_starts, num_restarts, sgd_iters = 8, 8, 50

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

    scanned = outer_mod.make_scanned_sga_program(
        state, tp, rule, xstarts, steps_per_call=10, lr=0.01,
        inner_iterations=10)
    fused = outer_mod.make_fused_sga_program(
        state, tp, rule, xstarts, max_iters=sgd_iters, lr=0.01,
        inner_iterations=10)

    def run_scanned(zi):
        xs, vals = outer_mod.stochastic_solve_scanned(
            state, tp._replace(rnstream=zi), rule, xstarts, restarts,
            max_iters=sgd_iters, lr=0.01, inner_iterations=10,
            program=scanned)
        jax.block_until_ready((xs, vals))
        return xs, vals

    def run_fused(zi):
        xs, vals = fused(state, zi, restarts)
        jax.block_until_ready((xs, vals))
        return xs, vals

    # warmup / compile + agreement check
    t0 = time.perf_counter()
    xs_s, vs_s = run_scanned(z)
    t_sc = time.perf_counter() - t0
    t0 = time.perf_counter()
    xs_f, vs_f = run_fused(z)
    t_fc = time.perf_counter() - t0
    print(f"compile+first run: scanned {t_sc:.1f}s fused {t_fc:.1f}s")
    js, jf = int(jnp.argmax(vs_s)), int(jnp.argmax(vs_f))
    print(f"argmax restart: scanned {js} fused {jf}  "
          f"|x* diff| = {float(np.max(np.abs(np.asarray(xs_s[js]) - np.asarray(xs_f[jf])))):.2e}")

    for name, fn in (("scanned", run_scanned), ("fused", run_fused)):
        ts = []
        for i in range(args.reps):
            zi = jnp.asarray(
                qmc.gen_low_discrepancy_sequence(mc_iters, d, horizon + 1), dtype)
            t0 = time.perf_counter()
            fn(zi)
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"{name:8s} acquisition: median {ts[len(ts)//2]*1e3:8.1f} ms "
              f"({ts[0]*1e3:.1f}-{ts[-1]*1e3:.1f})")


if __name__ == "__main__":
    main()

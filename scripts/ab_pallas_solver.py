"""On-TPU A/B: Pallas multistart-Newton kernel vs the XLA solver.

Benchmark-scale shapes (trid10d, cap 24, d 10, 10 starts, 1600 lanes):
checks solution quality (acquisition value at each lane's argmax) and
times both implementations.

Run:  python scripts/ab_pallas_solver.py [--lanes 1600] [--iters 10]
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
    p.add_argument("--lanes", type=int, default=1600)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--starts", type=int, default=8)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import pallas_newton as pn
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import solvers

    f32 = jnp.float32
    f = testfns.get_function("trid10d")
    d = f.dim
    n, cap = 12, 24
    L, S = args.lanes, args.starts

    rng = np.random.default_rng(0)
    kern = K.matern52((1.0,))
    base_X = qmc.randsample(n, d, f.lbs, f.ubs, rng)
    base_y = np.asarray(f.batch(base_X))

    # L lanes: same base data + one extra random "fantasy" point per lane
    st0 = sg.fit(kern, base_X, base_y, capacity=cap, noise=1e-5, dtype=f32)
    xf = jnp.asarray(qmc.randsample(L, d, f.lbs, f.ubs, rng), f32)
    yf = jnp.asarray(rng.standard_normal(L) * base_y.std() + base_y.mean(), f32)
    states = jax.vmap(lambda x, y: sg.condition(st0, x, y))(xf, yf)

    X = states.X
    Li = states.Li
    W = jnp.einsum("lji,ljk->lik", Li, Li)
    c = states.c
    nn = states.n
    fmini = jax.vmap(sg.get_active_minimum)(states)
    xstarts = jnp.asarray(
        qmc.generate_initial_guesses(S, f.lbs, f.ubs), f32)[: S + 2]
    rule = EI()
    theta = jnp.zeros((1,), f32)

    # ---- pallas ----
    def run_pallas():
        return pn.newton_solve_lanes(
            X, W, c, nn, fmini, jnp.zeros((L,), f32),
            st0.kernel.theta[0], f.lbs, f.ubs, xstarts,
            kind="matern52", rule="EI", iterations=args.iters,
            interpret=args.interpret,
        )

    t0 = time.perf_counter()
    xs_p, vs_p = jax.block_until_ready(run_pallas())
    compile_p = time.perf_counter() - t0
    times_p = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run_pallas())
        times_p.append(time.perf_counter() - t0)

    # ---- xla ----
    @jax.jit
    def run_xla():
        def one(st):
            xs, vals = solvers.newton_solve_batch(
                st, rule, theta, f.lbs, f.ubs, xstarts,
                iterations=args.iters)
            j = jnp.argmax(vals)
            return xs[j], vals[j]
        return jax.vmap(one)(states)

    t0 = time.perf_counter()
    xs_x, vs_x = jax.block_until_ready(run_xla())
    compile_x = time.perf_counter() - t0
    times_x = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run_xla())
        times_x.append(time.perf_counter() - t0)

    # ---- quality: re-evaluate both argmaxes through the same XLA posterior
    v_p = jax.vmap(lambda st, x: sg.acquisition(st, rule, x, theta))(states, xs_p)
    v_x = jax.vmap(lambda st, x: sg.acquisition(st, rule, x, theta))(states, xs_x)
    v_p, v_x = np.asarray(v_p), np.asarray(v_x)
    scale = np.maximum(1.0, np.abs(v_x))
    rel = (v_p - v_x) / scale
    same_argmax = np.mean(np.all(np.isclose(np.asarray(xs_p), np.asarray(xs_x),
                                            rtol=1e-3, atol=1e-4), axis=1))
    print(f"lanes={L} starts={xstarts.shape[0]} iters={args.iters}")
    print(f"pallas: compile {compile_p:.1f}s, run {np.median(times_p)*1e3:.2f} ms")
    print(f"xla:    compile {compile_x:.1f}s, run {np.median(times_x)*1e3:.2f} ms")
    print(f"speedup: {np.median(times_x)/np.median(times_p):.2f}x")
    print(f"quality: mean rel delta {rel.mean():+.2e} (pallas - xla), "
          f"min {rel.min():+.2e}, frac pallas>=xla-1e-4: "
          f"{np.mean(rel >= -1e-4):.4f}")
    print(f"argmax agreement: {same_argmax:.4f}")
    worst = np.argsort(rel)[:5]
    for i in worst:
        print(f"  lane {i}: v_pallas {v_p[i]:.6f} vs v_xla {v_x[i]:.6f}")


if __name__ == "__main__":
    main()

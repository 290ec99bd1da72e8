"""On-TPU A/B: the loose-acceptance (IPNewton-f_tol) Pallas lanes vs the
XLA loose solver, f32, benchmark-like shapes.

Complements scripts/ab_pallas_solver.py (which A/Bs the fixed-iteration
EI path): here the rule carries solve_f_tol = solve_x_tol = 1e-3 (the
POI-parity protocol, reference rbf_optim.jl:26-30) so every lane freezes
on its own schedule. Checks per-lane solution quality and times both.

Run:  python scripts/ab_pallas_loose.py [--lanes 1024] [--iters 10]
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
    p.add_argument("--lanes", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--starts", type=int, default=8)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models import decision_rules as dr
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import pallas_newton as pn
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import solvers

    f32 = jnp.float32
    f = testfns.get_function("hartmann6d")
    d = f.dim
    n, cap = 12, 24
    L, S = args.lanes, args.starts

    rng = np.random.default_rng(0)
    kern = K.matern52((1.0,))
    base_X = qmc.randsample(n, d, f.lbs, f.ubs, rng)
    base_y = np.asarray(f.batch(base_X))
    st0 = sg.fit(kern, base_X, base_y, capacity=cap, noise=1e-5, dtype=f32)
    xf = jnp.asarray(qmc.randsample(L, d, f.lbs, f.ubs, rng), f32)
    yf = jnp.asarray(rng.standard_normal(L) * base_y.std() + base_y.mean(), f32)
    states = jax.vmap(lambda x, y: sg.condition(st0, x, y))(xf, yf)

    X, Li, c, nn = states.X, states.Li, states.c, states.n
    W = jnp.einsum("lji,ljk->lik", Li, Li)
    fmini = jax.vmap(sg.get_active_minimum)(states)
    xstarts = jnp.asarray(
        qmc.generate_initial_guesses(S, f.lbs, f.ubs), f32)[: S + 2]
    rule = dr.POI()  # solve_f_tol = solve_x_tol = 1e-3
    theta = jnp.zeros((1,), f32)

    def run_pallas():
        return pn.newton_solve_lanes(
            X, W, c, nn, fmini, jnp.zeros((L,), f32),
            st0.kernel.theta[0], f.lbs, f.ubs, xstarts,
            kind="matern52", rule="POI", iterations=args.iters,
            f_tol=rule.solve_f_tol, x_tol=rule.solve_x_tol,
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

    # solution quality: re-evaluate the kernel's argmax through the XLA
    # acquisition and compare against the XLA winner per lane
    vcross = jax.vmap(
        lambda st, x: sg.acquisition(st, rule, x, theta))(states, xs_p)
    vcross = np.asarray(vcross)
    vx = np.asarray(vs_x)
    tol = rule.solve_f_tol * (np.abs(vx) + 1.0)
    ok = vcross >= vx - tol
    print(f"lanes={L} iters={args.iters} starts={S + 2}")
    print(f"pallas: compile {compile_p:.2f}s median {np.median(times_p):.4f}s")
    print(f"xla:    compile {compile_x:.2f}s median {np.median(times_x):.4f}s")
    print(f"speedup: {np.median(times_x) / np.median(times_p):.2f}x")
    print(f"within-loose-tolerance lanes: {ok.sum()}/{L}")
    print(f"max shortfall: {float(np.max(vx - vcross)):.3e}")
    assert ok.mean() > 0.99, "loose-lane quality regression"


if __name__ == "__main__":
    main()

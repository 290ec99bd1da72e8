"""Cost of repeated fantasy conditioning: rank-1 updates vs refits.

Script analog of the reference's
`/root/reference/notebooks/laplace_approximation.ipynb`, which measures the
allocation behavior of repeatedly conditioning a FantasySurrogate. In the
TPU engine all buffers are fixed-capacity device arrays, so there are no
per-step allocations to chase; the relevant costs are (a) wall time of the
rank-1 Schur append (`fantasy_condition`) vs a full O(N^3)
refactorization, and (b) the posterior-view cost at each fantasy index.
Also verifies that h conditions followed by `fantasy_reset` restores the
base posterior exactly (reference reset!, rbs.jl:476-480).

Run:  python examples/fantasy_conditioning.py [--capacity 64] [--horizon 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timeit(fn, *args, repeats=20):
    fn(*args)  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / repeats


def _block(out):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        out,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--capacity", type=int, default=64)
    p.add_argument("--n-init", type=int, default=24)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--dim", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from rollout_bo_tpu.models import fantasy as fant
    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.ops import kernels as K

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (args.n_init, args.dim))
    y = np.sin(X.sum(axis=1))
    state = sg.fit(K.matern52((1.0,)), X, y, capacity=args.capacity, noise=1e-6)
    fs = fant.make_fantasy(state, args.horizon)

    xnew = jnp.asarray(rng.uniform(-1, 1, (args.dim,)))
    ynew = jnp.asarray(0.3)

    cond = jax.jit(fant.fantasy_condition)
    refit_fn = jax.jit(lambda st: sg.refit(st))

    t_cond = _timeit(cond, fs, xnew, ynew)
    t_refit = _timeit(refit_fn, state)

    print(f"n={args.n_init}, capacity={args.capacity}, horizon={args.horizon}")
    print(f"rank-1 fantasy condition: {t_cond * 1e3:9.3f} ms")
    print(f"full refactorization:     {t_refit * 1e3:9.3f} ms")
    print(f"speedup:                  {t_refit / t_cond:9.2f}x")

    # condition h times, inspect per-index posterior, then reset
    fs_h = fs
    for j in range(args.horizon):
        xj = jnp.asarray(rng.uniform(-1, 1, (args.dim,)))
        fs_h = cond(fs_h, xj, jnp.asarray(float(rng.standard_normal())))
    xq = jnp.asarray(rng.uniform(-1, 1, (args.dim,)))
    print("\nposterior sigma at a held-out point by fantasy index:")
    for fi in range(-1, args.horizon):
        view = fant.view(fs_h, fi)
        print(f"  index {fi:2d}: sigma = {float(sg.posterior(view, xq).sigma):.6f}")

    fs_r = fant.fantasy_reset(fs_h)
    s0 = float(sg.posterior(fant.view(fs, -1), xq).sigma)
    s1 = float(sg.posterior(fant.view(fs_r, -1), xq).sigma)
    assert abs(s0 - s1) < 1e-12, (s0, s1)
    print(f"\nreset restores base posterior exactly (sigma {s1:.6f})")


if __name__ == "__main__":
    main()

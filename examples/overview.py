"""Myopic GP + EI walkthrough: posterior, EI landscape, one BO run.

Script analog of the reference's `/root/reference/notebooks/overview.ipynb`
(the myopic surrogate + EI validation notebook): fit a GP to a few samples
of a 1-D function, print posterior/EI values across the domain, run a
short myopic EI BO loop, and report the gap trajectory.

Run:  python examples/overview.py [--function-name gramacylee] [--budget 15]
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
    p.add_argument("--budget", type=int, default=15)
    p.add_argument("--n-init", type=int, default=4)
    p.add_argument("--grid", type=int, default=9)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import bo

    f = testfns.get_function(args.function_name)
    rng = np.random.default_rng(args.seed)
    X0 = qmc.randsample(args.n_init, f.dim, f.lbs, f.ubs, rng)
    y0 = np.asarray(f.batch(X0))
    state = sg.fit(K.matern52((0.5,)), X0, y0,
                   capacity=args.n_init + args.budget, noise=1e-6)
    theta = jnp.zeros((1,), state.X.dtype)

    print(f"== {args.function_name}: GP posterior / EI across the domain ==")
    print(f"{'x':>24}  {'mu':>10}  {'sigma':>9}  {'EI':>10}")
    grid = np.linspace(f.lbs, f.ubs, args.grid)
    rule = EI()
    for xv in grid:
        x = jnp.asarray(xv, state.X.dtype)
        post = sg.posterior(state, x)
        a = sg.acquisition(state, rule, x, theta)
        xs = np.array2string(np.asarray(xv), precision=3)
        print(f"{xs:>24}  {float(post.mu):>10.4f}  {float(post.sigma):>9.4f}"
              f"  {float(a):>10.6f}")

    print(f"\n== myopic EI BO, budget {args.budget} ==")
    res = bo.run_myopic_bo(f, rule, budget=args.budget, n_init=args.n_init,
                           seed=args.seed)
    gaps = np.asarray(res.gaps)
    print(f"initial best y: {float(np.asarray(res.y)[:args.n_init].min()):.5f}")
    print(f"final best y:   {float(np.asarray(res.y).min()):.5f}"
          f"   (f* = {f.fmin:.5f})")
    print(f"gap trajectory: {np.array2string(gaps, precision=3)}")
    print(f"final gap:      {float(gaps[-1]):.4f}")


if __name__ == "__main__":
    main()

"""Capture a jax.profiler trace of the headline-benchmark SGA step.

Writes trace to /tmp/rollout_trace and prints the top XLA ops by total
duration (parsed from the trace's trace.json.gz).

Run:  python scripts/profile_bench.py [--steps 5]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--outdir", default="/tmp/rollout_trace")
    p.add_argument("--top", type=int, default=30)
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
    z = qmc.gen_low_discrepancy_sequence(mc_iters, d, horizon + 1)
    tp = TrajectoryParams(
        x0=jnp.zeros((d,), dtype),
        theta=jnp.asarray([0.0], dtype),
        lbs=jnp.asarray(f.lbs, dtype),
        ubs=jnp.asarray(f.ubs, dtype),
        rnstream=jnp.asarray(z, dtype),
    )
    rule = EI()
    restarts = jnp.asarray(qmc.generate_batch(num_restarts, f.lbs, f.ubs)[:num_restarts], dtype)

    step = outer_mod.make_batched_sga_step(state, tp, rule, xstarts,
                                           lr=0.01, inner_iterations=10)
    opt = outer_mod.AdamState(jnp.zeros_like(restarts), jnp.zeros_like(restarts),
                              jnp.zeros((), jnp.int32))
    carry = (restarts, opt, jnp.zeros((restarts.shape[0],), bool),
             jnp.zeros((restarts.shape[0],), dtype))
    carry = step(state, tp.rnstream, carry)  # compile
    jax.block_until_ready(carry)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            carry = step(state, tp.rnstream, carry)
        jax.block_until_ready(carry)
    wall = time.perf_counter() - t0
    print(f"{args.steps} steps in {wall:.3f}s = {wall/args.steps*1e3:.1f} ms/step")

    paths = sorted(glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found"); return
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    dur = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        cat = ev.get("args", {}) or {}
        name = ev.get("name", "?")
        # keep device-side ops only (XLA op events carry 'long_name' or tf_op)
        if "long_name" not in cat and "hlo_category" not in cat:
            continue
        key = cat.get("hlo_category", name)
        d_us = float(ev.get("dur", 0.0))
        dur[key] += d_us
        cnt[key] += 1
        total += d_us
    print(f"\ntop HLO categories by device time (total {total/1e3:.1f} ms):")
    for k, v in sorted(dur.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {v/1e3:9.2f} ms  {cnt[k]:7d}x  {k}")


if __name__ == "__main__":
    main()

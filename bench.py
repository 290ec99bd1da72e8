"""Headline benchmark: h=3 rollout-acquisition optimization per BO iteration.

Mirrors the reference's archived nonmyopic-shortrun-timing configuration
(/root/reference/experiments/archived/nonmyopic-shortrun-timing/
nonmyopic_bayesopt/metadata.txt): trid10d, horizon 3, 200 MC samples,
batch of 8 outer SGA restarts, 50 SGD iterations with early stopping,
8(+2) inner multistarts, QMC variance reduction, budget-15 surrogate.
Reference wall time: 309.4 s per BO iteration (trid10d rollout_h3_times).

Prints ONE JSON line: steady-state seconds per BO-iteration acquisition
optimization on this chip, and the speedup vs the reference baseline.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: axon remote compiles are slow (minutes); the
# cache makes repeat bench runs start in seconds
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_S = 309.4  # reference trid10d h=3 s/iter (BASELINE.md)


def main():
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
    X0 = qmc.randsample(n_init + 7, d, f.lbs, f.ubs, rng)  # mid-run surrogate size
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

    # production path: the whole multi-restart SGA solve INCLUDING winner
    # selection is ONE device program (while_loop + device-side exact early
    # exit + on-device argmax; see outer.make_fused_sga_program and
    # scripts/ab_fused_outer.py — vs the scanned program's 317 ms at
    # identical argmax). Host-side argmax/gather would add two more
    # round-trips through the device tunnel per acquisition.
    program = outer_mod.make_fused_sga_program(
        state, tp, rule, xstarts, max_iters=sgd_iters, lr=0.01,
        inner_iterations=10, select_best=True)

    def acquire(state, rnstream, restarts):
        return program(state, rnstream, restarts)

    # warmup / compile
    xb, vb = acquire(state, tp.rnstream, restarts)
    xb.block_until_ready()
    assert np.all(np.isfinite(np.asarray(xb))), "non-finite acquisition result"

    times = []
    for it in range(3):
        zi = jnp.asarray(
            qmc.gen_low_discrepancy_sequence(mc_iters, d, horizon + 1), dtype)
        t0 = time.perf_counter()
        xb, vb = acquire(state, zi, restarts)
        xb.block_until_ready()
        times.append(time.perf_counter() - t0)

    val = float(np.median(times))
    print(json.dumps({
        "metric": "trid10d_h3_rollout_acq_opt_seconds_per_iter",
        "value": val,
        "unit": "s",
        "vs_baseline": BASELINE_S / val,
    }))


if __name__ == "__main__":
    main()

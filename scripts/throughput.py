"""Rollout trajectory throughput: trajectories/s/chip + scaling check.

The BASELINE.json north-star asks for "trajectories/s at speed-of-light
per chip and scaling efficiency at 1 chip, 1 host, and N>=2 hosts". One
"trajectory" = one h-step fantasy rollout (h inner multistart-Newton
solves + h+1 joint (f, grad f) draws + rank-1 conditions) PLUS its
reverse-mode gradient w.r.t. (x0, theta) — i.e. one lane of the
production estimator `simulate_trajectory_mc(with_gradients=True)`
(reference: one iteration of the serial loop at rollout.jl:293-326).

Default mode measures the real attached chip. `--virtual N` re-runs the
sharded estimator on an N-device virtual CPU mesh (weak scaling: fixed
per-device batch). Virtual devices share one host's cores, so the
virtual numbers validate that the GSPMD program partitions the MC axis
without replicating work (time roughly flat as N grows on an idle many-
core host == per-device compute is constant); they are NOT a hardware
scaling measurement — multi-chip hardware is not reachable from this
container. On real hardware the same program's only cross-device
traffic is the final mean/std reduction (d+2 floats per lane), so the
weak-scaling ceiling is the ICI all-reduce of a few hundred bytes.

Usage:
  python scripts/throughput.py                # real chip, prints JSON
  python scripts/throughput.py --virtual 8    # virtual CPU mesh check
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=0,
                   help="run on an N-device virtual CPU mesh instead of the real chip")
    p.add_argument("--mc", type=int, default=4096, help="trajectories per call")
    p.add_argument("--horizon", type=int, default=3)
    p.add_argument("--function", default="trid10d")
    p.add_argument("--inner-iterations", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    return p.parse_args()


def main():
    args = parse_args()
    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models import testfns
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K
    from rollout_bo_tpu.ops import qmc
    from rollout_bo_tpu.rollout import mc as mc_mod
    from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

    dtype = jnp.float32
    f = testfns.get_function(args.function)
    d, h = f.dim, args.horizon

    rng = np.random.default_rng(1906)
    X0 = qmc.randsample(12, d, f.lbs, f.ubs, rng)
    y0 = np.asarray(f.batch(X0))
    state = sg.fit(K.matern52((1.0,)), X0, y0, capacity=20, noise=1e-5,
                   dtype=dtype)
    xstarts = jnp.asarray(qmc.generate_initial_guesses(8, f.lbs, f.ubs), dtype)
    z = jnp.asarray(qmc.gen_low_discrepancy_sequence(args.mc, d, h + 1), dtype)
    tp = TrajectoryParams(
        x0=jnp.zeros((d,), dtype), theta=jnp.asarray([0.0], dtype),
        lbs=jnp.asarray(f.lbs, dtype), ubs=jnp.asarray(f.ubs, dtype),
        rnstream=z,
    )
    rule = EI()

    results = {
        "metric": "rollout_trajectories_per_second",
        "function": args.function, "horizon": h, "dim": d,
        "mc_per_call": args.mc, "inner_iterations": args.inner_iterations,
        "with_gradients": True,
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
    }

    if args.virtual:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rollout_bo_tpu.parallel import mesh as mesh_mod

        # weak scaling: args.mc trajectories PER DEVICE
        per_dev = args.mc
        rows = []
        for n in (1, 2, 4, 8):
            if n > args.virtual:
                break
            mesh = mesh_mod.make_mesh(jax.devices()[:n], restarts=1, mc=n)
            zN = jnp.asarray(
                qmc.gen_low_discrepancy_sequence(per_dev * n, d, h + 1), dtype)
            # place ONCE and build the jitted program ONCE per mesh — a
            # fresh jit wrapper per timed rep would pay retrace/lowering
            # inside the measurement and distort the scaling numbers
            rn = jax.device_put(
                zN, NamedSharding(mesh, P(("restarts", "mc"), None, None)))
            tpN = tp._replace(rnstream=rn)
            st = mesh_mod.replicate(state, mesh)
            fn = jax.jit(
                lambda s, t: mc_mod.simulate_trajectory_mc(
                    s, t, rule, xstarts, with_gradients=True,
                    iterations=args.inner_iterations),
                out_shardings=NamedSharding(mesh, P()),
            )
            eto = fn(st, tpN)
            jax.block_until_ready(eto.mu)
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                eto = fn(st, tpN)
                jax.block_until_ready(eto.mu)
                ts.append(time.perf_counter() - t0)
            dt_med = float(np.median(ts))
            rows.append({"devices": n, "trajectories": per_dev * n,
                         "seconds": dt_med,
                         "traj_per_s": per_dev * n / dt_med})
        base = rows[0]["traj_per_s"]
        for r in rows:
            r["weak_scaling_efficiency"] = r["traj_per_s"] / (base * r["devices"])
        results["mode"] = "virtual_cpu_weak_scaling"
        results["rows"] = rows
    else:
        fn = jax.jit(lambda st, tpx: mc_mod.simulate_trajectory_mc(
            st, tpx, rule, xstarts, with_gradients=True,
            iterations=args.inner_iterations))
        eto = fn(state, tp)
        jax.block_until_ready(eto.mu)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            eto = fn(state, tp)
            jax.block_until_ready(eto.mu)
            ts.append(time.perf_counter() - t0)
        dt_med = float(np.median(ts))
        results["mode"] = "single_chip"
        results["seconds_per_call"] = dt_med
        results["value"] = args.mc / dt_med
        results["unit"] = "trajectories/s/chip"
        # reference: one serial Julia trajectory+gradient of the h=3
        # trid10d config is ~309.4s / (50 SGD iters * 8 restarts * 200 MC)
        # at the bench shape == ~3.9 ms/trajectory ~ 258 traj/s equivalent.
        results["reference_equiv_traj_per_s"] = (50 * 8 * 200) / 309.4

    sys.stdout.write(json.dumps(results) + "\n")


if __name__ == "__main__":
    main()

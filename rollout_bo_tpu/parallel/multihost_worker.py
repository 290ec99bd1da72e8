"""Multi-HOST worker: one process of a `jax.distributed` group running the
fused multi-restart SGA solve over a mesh that spans every process.

This is the executable proof of the multi-host leg of the parallel design
(`parallel/mesh.py::initialize_distributed`): the reference fans out with
`Distributed.addprocs` + `SharedArrays` on one machine
(`/root/reference/experiments/adaptive_bayesopt.jl:92-97,483-488`); here
each process is a jax.distributed participant, the ('restarts', 'mc')
mesh covers the union of all processes' devices, and the GSPMD
collectives (per-restart MC mean reductions, the all-stopped early-exit
all-reduce, winner argmax) ride the backend transport — ICI on a real
TPU pod, gloo over TCP on the CPU backend used by the tests.

The worker builds a DETERMINISTIC problem (shared with
tests/test_multihost.py, which compares process-0's result against the
single-process unsharded solve), so the same module doubles as a
correctness harness and a throughput probe (`--bench-mc`).

Launch (2 local processes, 4 virtual CPU devices each):

    ROLLOUT_BO_TPU_PLATFORM=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m rollout_bo_tpu.parallel.multihost_worker \
        --process-id 0 --num-processes 2 --port 12395 --out /tmp/p0.npz &
    ... same with --process-id 1 ...

NOTE: the platform/device-count env vars must be set BEFORE the
interpreter starts (package import initializes the JAX backend).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import kernels as K
from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.parallel import mesh as mesh_mod
from rollout_bo_tpu.parallel import sharded
from rollout_bo_tpu.rollout import mc as mc_mod
from rollout_bo_tpu.rollout.trajectory import TrajectoryParams


def build_problem(mc_iters: int = 16, horizon: int = 1, n_starts: int = 8):
    """Deterministic tiny GP problem; identical in every process and in
    the single-process reference run of tests/test_multihost.py."""
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0.0, 1.0, size=(6, 1)), axis=0)
    y = np.sin(6 * X[:, 0]) + 0.3 * X[:, 0]
    st = sg.fit(K.matern52((0.3,)), X, y, capacity=12, noise=1e-6)
    z = np.random.default_rng(3).normal(size=(mc_iters, 2, horizon + 1))
    tp = TrajectoryParams(
        x0=jnp.asarray([0.52], st.X.dtype),
        theta=jnp.asarray([0.0], st.X.dtype),
        lbs=jnp.asarray([0.0], st.X.dtype),
        ubs=jnp.asarray([1.0], st.X.dtype),
        rnstream=jnp.asarray(z, st.X.dtype),
    )
    xstarts = jnp.asarray(qmc.generate_initial_guesses(4, [0.0], [1.0]),
                          st.X.dtype)
    starts = np.linspace(0.1, 0.9, n_starts)[:, None]
    return st, tp, xstarts, starts


SOLVE_KW = dict(max_iters=4, inner_iterations=10)


def main(argv=None):
    p = argparse.ArgumentParser("multihost worker")
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--out", default=None,
                   help="npz path for process 0's (xs, vals) result")
    p.add_argument("--bench-mc", type=int, default=0,
                   help="also time sharded_simulate_mc with this many "
                        "trajectories PER DEVICE (weak scaling probe)")
    args = p.parse_args(argv)

    jax.config.update("jax_enable_x64", True)
    nproc = mesh_mod.initialize_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert nproc == args.num_processes, (nproc, args.num_processes)
    ndev = jax.device_count()
    print(f"[p{args.process_id}] processes={nproc} "
          f"local_devices={jax.local_device_count()} global_devices={ndev}",
          flush=True)

    # restarts axis across the 2 process groups, mc axis within
    if ndev < 2 or ndev % 2 != 0:
        raise SystemExit(
            f"multihost_worker needs an even global device count >= 2 to "
            f"build its (restarts=2, mc={max(ndev // 2, 1)}) mesh; got "
            f"{ndev}. On CPU, raise the virtual device count with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=<N>.")
    mesh = mesh_mod.make_mesh(restarts=2, mc=ndev // 2)
    st, tp, xstarts, starts = build_problem()
    rule = dr.EI()
    xs, vals = sharded.sharded_stochastic_solve_fused(
        st, tp, rule, xstarts, starts, mesh, **SOLVE_KW)

    # replicate outputs (collective, every process participates) so each
    # host can materialize the full result
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
    xs = np.asarray(rep(xs))
    vals = np.asarray(rep(vals))
    print(f"[p{args.process_id}] winner={int(vals.argmax())} "
          f"best={vals.max():.12f}", flush=True)

    if args.bench_mc:
        m = args.bench_mc * ndev
        stb, tpb, xstartsb, _ = build_problem(mc_iters=m)
        # warmup (compile) + timed repetitions
        def run():
            out = sharded.sharded_simulate_mc(
                stb, tpb, rule, xstartsb, mesh, with_gradients=True,
                iterations=10)
            jax.block_until_ready(out.mu)
        run()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            run()
        dt = (time.perf_counter() - t0) / reps
        print(f"[p{args.process_id}] bench_mc: {m} trajectories "
              f"{dt * 1e3:.1f} ms/call {m / dt:.0f} traj/s", flush=True)

    if args.out and args.process_id == 0:
        np.savez(args.out, xs=xs, vals=vals)
    print(f"[p{args.process_id}] OK", flush=True)


if __name__ == "__main__":
    main()

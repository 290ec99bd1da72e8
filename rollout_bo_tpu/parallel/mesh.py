"""Device mesh + sharding helpers for rollout BO.

The reference's parallel design is Julia Distributed + SharedArrays on a
single host (adaptive_bayesopt.jl:92-97, 483-488 — stale). The TPU-native
equivalent: a jax.sharding.Mesh over all devices with two data axes —

- 'restarts': outer SGA restarts / candidate batch points
- 'mc':       Monte-Carlo trajectories per acquisition evaluation

Each is embarrassingly parallel (SURVEY §2 parallelism table); sharding
the batch inputs with NamedSharding and jitting the *same* single-device
functions lets XLA GSPMD partition the computation and insert the
psum/all-reduce collectives for the mean/std reductions and argmax winner
selection over ICI.

Multi-host: call jax.distributed.initialize() before building the mesh;
jax.devices() then spans all hosts and the same code runs unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "shard_leading",
    "replicate",
    "P",
    "Mesh",
    "NamedSharding",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Join a multi-host process group (the reference's Distributed.addprocs
    analog, adaptive_bayesopt.jl:92; here: jax.distributed.initialize).

    With no arguments, reads the standard cluster env (TPU pod runtime /
    JAX_COORDINATOR_ADDRESS etc.). Safe to call on a single host: if no
    cluster environment is detected it is a no-op. Returns the process
    count.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-host / no cluster env: run locally
        pass
    return jax.process_count()


def make_mesh(
    devices=None,
    *,
    restarts: int = 1,
    mc: int | None = None,
) -> Mesh:
    """Build a ('restarts', 'mc') mesh over the given (or all) devices.

    By default all devices go to the 'mc' axis. `restarts` x `mc` must
    equal the device count; `mc=None` infers it.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if mc is None:
        if n % restarts != 0:
            raise ValueError(f"{n} devices not divisible by restarts={restarts}")
        mc = n // restarts
    if restarts * mc != n:
        raise ValueError(f"mesh {restarts}x{mc} != {n} devices")
    return Mesh(devices.reshape(restarts, mc), ("restarts", "mc"))


def shard_leading(x, mesh: Mesh, axis: str):
    """Shard the leading dimension of x along a mesh axis; rest replicated."""
    spec = P(axis, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)

"""Checkpoint / resume for BO runs.

The reference has NO checkpointing — a crashed trial keeps completed CSV
rows but cannot resume a trial (SURVEY §5.4). Here every BO iteration can
snapshot the full surrogate state + metrics to a single .npz, and a run
can resume mid-trial from the last snapshot.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import chol as chol_ops
from rollout_bo_tpu.ops import kernels as kern

__all__ = ["save_state", "load_state", "save_bo_checkpoint", "load_bo_checkpoint"]


def save_state(path: str, state: sg.SurrogateState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        kind=np.asarray(state.kernel.kind),
        theta=np.asarray(state.kernel.theta),
        X=np.asarray(state.X),
        y=np.asarray(state.y),
        L=np.asarray(state.L),
        c=np.asarray(state.c),
        n=np.asarray(state.n),
        noise=np.asarray(state.noise),
    )


def load_state(path: str) -> sg.SurrogateState:
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    kernel = kern.RBFKernel(theta=jnp.asarray(z["theta"]), kind=str(z["kind"]))
    return sg.SurrogateState(
        kernel=kernel,
        X=jnp.asarray(z["X"]),
        y=jnp.asarray(z["y"]),
        L=jnp.asarray(z["L"]),
        c=jnp.asarray(z["c"]),
        n=jnp.asarray(z["n"]),
        noise=jnp.asarray(z["noise"]),
        Li=chol_ops.tri_inv_padded(jnp.asarray(z["L"])),
    )


def save_bo_checkpoint(path: str, state: sg.SurrogateState, *, iteration: int,
                       metrics: dict | None = None) -> None:
    """Snapshot the surrogate + loop position + metric arrays."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = dict(
        kind=np.asarray(state.kernel.kind),
        theta=np.asarray(state.kernel.theta),
        X=np.asarray(state.X),
        y=np.asarray(state.y),
        L=np.asarray(state.L),
        c=np.asarray(state.c),
        n=np.asarray(state.n),
        noise=np.asarray(state.noise),
        iteration=np.asarray(iteration),
    )
    for k, v in (metrics or {}).items():
        payload["metric_" + k] = np.asarray(v)
    np.savez(path, **payload)


def load_bo_checkpoint(path: str, capacity: int | None = None):
    """Returns (state, iteration, metrics dict).

    `capacity` re-fits the surrogate's fixed-size buffers to a different
    capacity (exact refactorization of the active observations) — needed
    when a snapshot taken under one budget resumes under a larger one:
    `condition` at full capacity would silently drop new observations
    (the buffers are static under jit; see surrogate.condition).
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    kernel = kern.RBFKernel(theta=jnp.asarray(z["theta"]), kind=str(z["kind"]))
    n = int(z["n"])
    if capacity is not None and capacity != z["X"].shape[0]:
        state = sg.fit(kernel, z["X"][:n], z["y"][:n], capacity=capacity,
                       noise=float(z["noise"]), dtype=z["X"].dtype)
    else:
        state = sg.SurrogateState(
            kernel=kernel,
            X=jnp.asarray(z["X"]),
            y=jnp.asarray(z["y"]),
            L=jnp.asarray(z["L"]),
            c=jnp.asarray(z["c"]),
            n=jnp.asarray(z["n"]),
            noise=jnp.asarray(z["noise"]),
            Li=chol_ops.tri_inv_padded(jnp.asarray(z["L"])),
        )
    metrics = {k[len("metric_"):]: z[k] for k in z.files if k.startswith("metric_")}
    return state, int(z["iteration"]), metrics

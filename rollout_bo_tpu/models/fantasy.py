"""Fantasy surrogate: h-step lookahead conditioning with coefficient history.

TPU-native re-design of the reference `FantasySurrogate`
(`/root/reference/radial_basis_surrogates.jl:320-585`):

- Buffers are sized capacity + horizon + 1 (rbs.jl:345-365) — static.
- The reference's growing `cs::Vector{Vector}` coefficient history
  (rbs.jl:326, 422-429) becomes a stacked (horizon+2, capF) array written
  at fantasy-step slots, so any intermediate posterior along a trajectory
  can be re-evaluated with a dynamic index — exactly what the adjoint
  needs (recover_policy_solve, rollout.jl:114-124).
- `view(fs, fantasy_index)` materializes the posterior "slice"
  (rbs.jl:482-505: slice = 1:observed+fantasy_index+1, c = cs[...]) as a
  zero-copy SurrogateState, so every surrogate operation (posterior,
  acquisition, draws) applies unchanged.

fantasy_index convention (reference constants.jl:7): -1 = ground-truth
(base) posterior; i >= 0 = conditioned on fantasies 0..i.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import chol as chol_ops
from rollout_bo_tpu.ops import kernels as kern
from rollout_bo_tpu.ops.kernels import RBFKernel

__all__ = ["FantasyState", "make_fantasy", "view", "fantasy_condition", "fantasy_reset"]


class FantasyState(NamedTuple):
    kernel: RBFKernel
    X: jax.Array        # (capF, d)
    y: jax.Array        # (capF,)
    L: jax.Array        # (capF, capF), identity-padded
    cs: jax.Array       # (h+2, capF) coefficient history; cs[0] = base
    n_base: jax.Array   # () int32 — real observations
    m: jax.Array        # () int32 — fantasies observed (0..h+1)
    noise: jax.Array
    Li: jax.Array       # (capF, capF) explicit L^{-1}, identity-padded

    @property
    def capacity(self) -> int:
        return self.X.shape[0]

    @property
    def dim(self) -> int:
        return self.X.shape[1]

    @property
    def horizon(self) -> int:
        return self.cs.shape[0] - 2


def make_fantasy(state: sg.SurrogateState, horizon: int) -> FantasyState:
    """Embed a base surrogate into fantasy buffers (reference rbs.jl:345-381)."""
    cap = state.capacity
    capF = cap + horizon + 1
    d = state.dim
    dt = state.X.dtype

    X = jnp.zeros((capF, d), dt).at[:cap].set(state.X)
    y = jnp.zeros((capF,), dt).at[:cap].set(state.y)
    L = jnp.eye(capF, dtype=dt).at[:cap, :cap].set(state.L)
    Li = jnp.eye(capF, dtype=dt).at[:cap, :cap].set(state.Li)
    cs = jnp.zeros((horizon + 2, capF), dt).at[0, :cap].set(state.c)
    return FantasyState(
        kernel=state.kernel,
        X=X,
        y=y,
        L=L,
        cs=cs,
        n_base=state.n,
        m=jnp.asarray(0, jnp.int32),
        noise=state.noise,
        Li=Li,
    )


def view(fs: FantasyState, fantasy_index) -> sg.SurrogateState:
    """Posterior view at a fantasy index (-1 = base).

    reference: FantasySurrogate eval slicing (rbs.jl:482-505) — active
    count n_base + fantasy_index + 1, coefficients cs[fantasy_index + 1].

    The identity-padding invariant must hold for rows >= n or the padded
    triangular solves leak fantasy rows appended *after* this index into
    the posterior. For a lower-triangular factor the leading n x n block
    of L^{-1} is exactly (L[:n, :n])^{-1}, so restoring identity padding
    on both L and Li yields the exact factor pair of the sliced state —
    views at ANY past index are correct, not just the newest.
    """
    fi = jnp.asarray(fantasy_index, jnp.int32)
    n = fs.n_base + fi + 1
    c = jnp.take(fs.cs, fi + 1, axis=0)
    rows = jnp.arange(fs.capacity)[:, None]
    eye = jnp.eye(fs.capacity, dtype=fs.L.dtype)
    L = jnp.where(rows >= n, eye, fs.L)
    Li = jnp.where(rows >= n, eye, fs.Li)
    return sg.SurrogateState(fs.kernel, fs.X, fs.y, L, c, n, fs.noise, Li)


def fantasy_condition(fs: FantasyState, xnew, ynew) -> FantasyState:
    """Append one fantasy observation (reference condition!, rbs.jl:431-441).

    Rank-1 Schur row append at slot n_base + m; writes the new coefficient
    vector into history slot m + 1.
    """
    dt = fs.X.dtype
    xnew = jnp.asarray(xnew, dt)
    ynew = jnp.asarray(ynew, dt)
    n = fs.n_base + fs.m
    capF = fs.capacity

    kvec = kern.eval_KxX(fs.kernel, xnew, fs.X)
    k0 = fs.kernel.psi(jnp.zeros((), dt)) + fs.noise
    L, Li = chol_ops.chol_append_row_with_inv(fs.L, fs.Li, kvec, k0, n)

    rows = jnp.arange(capF)
    X = jnp.where((rows == n)[:, None], xnew[None, :], fs.X)
    y = jnp.where(rows == n, ynew, fs.y)
    mask = (rows < n + 1).astype(dt)
    c_new = chol_ops.psd_apply(Li, y * mask)
    cs = jax.lax.dynamic_update_index_in_dim(fs.cs, c_new, fs.m + 1, axis=0)
    return fs._replace(X=X, y=y, L=L, Li=Li, cs=cs, m=fs.m + 1)


def fantasy_reset(fs: FantasyState) -> FantasyState:
    """Drop all fantasies (reference reset!, rbs.jl:476-480).

    Restores the identity-padding invariant on the Cholesky rows written by
    fantasy conditioning (required for the padded triangular solves; stale
    X/y/cs rows are harmless because they are masked by the active count).
    """
    rows = jnp.arange(fs.capacity)[:, None]
    eye = jnp.eye(fs.capacity, dtype=fs.L.dtype)
    L = jnp.where(rows >= fs.n_base, eye, fs.L)
    Li = jnp.where(rows >= fs.n_base, eye, fs.Li)
    return fs._replace(L=L, Li=Li, m=jnp.asarray(0, jnp.int32))

"""Observable mechanisms for trajectories: draw-function factories.

Re-design of `/root/reference/observables.jl`. The reference's mutable
observable objects (step counters + cached observation/gradient arrays)
become pure `draw_fn(st_view, x, step) -> (y, grad_y)` closures consumed
by `rollout_core`; the caches are the scan outputs (TrajectoryRecord).

- stochastic_observable: joint (f, grad f) sample-path draws from the
  fantasy posterior with a fixed CRN normal column per step
  (observables.jl:83-124 + gp_draw rbs.jl:588-611).
- gauss_hermite_observable: y = mu + sqrt(2) sigma nu_step
  (observables.jl:32-81); *fully* differentiable — unlike the stochastic
  case, the exact derivative is the reference's cached gradient
  mu' + sqrt(2) sigma' nu plus the (reference-ignored) dependence through
  the conditioning data, which autodiff includes for free.
- deterministic_observable: ground-truth f / grad f (observables.jl:126-152;
  the reference constructor has a latent bug reading a global `testfn` —
  here the function is an explicit argument).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.ops import small_chol
from rollout_bo_tpu.rollout.trajectory import sample_path_draw

__all__ = [
    "stochastic_observable",
    "gauss_hermite_observable",
    "deterministic_observable",
]


def stochastic_observable(zstream, mode: str = "reparam"):
    """zstream: (d+1, h+1) standard normals (one column per step).

    mode:
    - "reparam" (default): the draw y = [dmu(x) + chol(joint cov)(x) z]_0
      is differentiated exactly (reparameterization/pathwise derivative
      with the z's held fixed). This makes jax.grad of the MC estimator
      the *exact* gradient of the fixed-stream estimator — it matches
      centered finite differences of the MC value under common random
      numbers to solver precision, and is an unbiased gradient estimator
      of d/dx0 E[reward].
    - "sample_path": the reference's coupling (observables.jl:106-124 +
      rollout.jl:164): the trajectory is treated as evaluations of a
      fixed GP sample path, dy/dx = the drawn gradient rows, and the
      draw's dependence on the conditioning state is dropped. Also an
      unbiased estimator, but NOT consistent with FD of the fixed-z MC
      value (the two differ by the reparameterization terms).
    """

    def draw(st, x, j):
        z = jax.lax.dynamic_index_in_dim(zstream, j, axis=1, keepdims=False)
        if mode == "sample_path":
            return sample_path_draw(st, x, z)
        # reparam: the draw's value only involves row 0 of chol(S), which
        # is sqrt(S[0,0]) — differentiate that scalar path and keep the
        # full factor (needed only for the reported gradient rows) under
        # stop_gradient, avoiding the numerically fragile Cholesky
        # backward on marginally-PD joint covariances in float32.
        dmu, S = sg.joint_posterior_cov(st, x)
        y = dmu[0] + jnp.sqrt(S[0, 0]) * z[0]
        Ld = jax.lax.stop_gradient(
            small_chol.chol_small(jax.lax.stop_gradient(S))
            if S.shape[-1] <= small_chol.UNROLL_LIMIT
            else jnp.linalg.cholesky(jax.lax.stop_gradient(S)))
        gy = jax.lax.stop_gradient(dmu[1:] + (Ld @ z)[1:])
        return y, gy

    return draw


def gauss_hermite_observable(nodes):
    """nodes: (h+1,) Gauss-Hermite nodes for this trajectory's index tuple."""

    def draw(st, x, j):
        nu = jax.lax.dynamic_index_in_dim(nodes, j, keepdims=False)
        p = sg.posterior(st, x)
        y = p.mu + jnp.sqrt(2.0) * p.sigma * nu
        gy = p.grad_mu + jnp.sqrt(2.0) * p.grad_sigma * nu
        return y, gy

    return draw


def deterministic_observable(f, grad_f=None):
    """Ground-truth observations; derivative is exact via autodiff."""

    def draw(st, x, j):
        y = f(x)
        gy = grad_f(x) if grad_f is not None else jax.grad(f)(x)
        return y, gy

    return draw

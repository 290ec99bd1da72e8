"""Experiment setup container (reference: ExperimentSetup, utils.jl:174-208).

The reference preallocates, per BO iteration: the Sobol + epsilon-interior
multistart guesses for the inner solves (generate_initial_guesses,
utils.jl:145-153), the batch of outer SGA restart candidates
(adaptive_bayesopt.jl:480), and the per-sample resolution/gradient
containers. In the functional TPU engine the containers are unnecessary
(results are returned, not written into SharedArrays), so `ExperimentSetup`
bundles exactly the *inputs* every nonmyopic solve needs — inner starts,
outer restarts, the QMC rnstream tensor, and a ready TrajectoryParams —
computed once and reused across BO iterations.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from rollout_bo_tpu.ops import qmc
from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

__all__ = ["ExperimentSetup"]


@dataclasses.dataclass(frozen=True)
class ExperimentSetup:
    """Precomputed inputs for one nonmyopic acquisition optimization.

    xstarts:  (S, d) inner multistart guesses (Sobol, eps-interior).
    restarts: (R, d) outer SGA restart candidates.
    tp:       TrajectoryParams with the QMC rnstream (M, d+1, h+1) and the
              box bounds; `tp.x0` is a placeholder — the outer solvers
              replace it per restart.
    """

    xstarts: jnp.ndarray
    restarts: jnp.ndarray
    tp: TrajectoryParams
    horizon: int
    mc_iters: int

    @classmethod
    def build(
        cls,
        lbs,
        ubs,
        *,
        horizon: int,
        mc_iters: int = 100,
        num_starts: int = 8,
        num_restarts: int = 8,
        theta=(0.0,),
        variance_reduction: bool = True,
        rng: np.random.Generator | None = None,
        dtype=None,
    ) -> "ExperimentSetup":
        """Mirror of the reference constructor (utils.jl:174-208).

        variance_reduction toggles QMC (Sobol/Box-Muller) vs pseudo-random
        normal streams (reference TrajectoryParameters kwarg,
        trajectory.jl:71-94).
        """
        lbs = np.asarray(lbs, float)
        ubs = np.asarray(ubs, float)
        d = lbs.shape[0]
        rng = rng or np.random.default_rng(0)
        xstarts = qmc.generate_initial_guesses(num_starts, lbs, ubs)
        restarts = qmc.generate_batch(num_restarts, lbs, ubs)[:num_restarts]
        if variance_reduction:
            z = qmc.gen_low_discrepancy_sequence(mc_iters, d, horizon + 1)
        else:
            z = rng.standard_normal((mc_iters, d + 1, horizon + 1))
        tp = TrajectoryParams(
            x0=jnp.zeros((d,), dtype),
            theta=jnp.asarray(theta, dtype),
            lbs=jnp.asarray(lbs, dtype),
            ubs=jnp.asarray(ubs, dtype),
            rnstream=jnp.asarray(z, dtype),
        )
        return cls(
            xstarts=jnp.asarray(xstarts, dtype),
            restarts=jnp.asarray(restarts, dtype),
            tp=tp,
            horizon=horizon,
            mc_iters=mc_iters,
        )

    def resample(self, rng: np.random.Generator, *, variance_reduction=True,
                 start_index: int = 0) -> "ExperimentSetup":
        """Fresh rnstream (new QMC offset or new pseudo-random draws)."""
        d = int(self.tp.lbs.shape[0])
        dt = self.tp.rnstream.dtype
        if variance_reduction:
            z = qmc.gen_low_discrepancy_sequence(
                self.mc_iters, d, self.horizon + 1, start=start_index)
        else:
            z = rng.standard_normal((self.mc_iters, d + 1, self.horizon + 1))
        return dataclasses.replace(
            self, tp=self.tp._replace(rnstream=jnp.asarray(z, dt)))

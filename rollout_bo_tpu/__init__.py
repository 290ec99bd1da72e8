"""rollout_bo_tpu — a TPU-native non-myopic Bayesian-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DarianNwankwo/Rollout-Bayesian-Optimization (pure Julia, serial CPU):

- GP (RBF-kernel) surrogates with fixed-capacity buffers and incremental
  (rank-1 Schur-complement) Cholesky updates, expressed as pure pytree
  transformations (reference: radial_basis_surrogates.jl:30-222).
- Rollout (non-myopic) acquisition functions: h steps of myopic BO on
  fantasized GP samples, scored by improvement over the incumbent and
  averaged over quasi-MC / Gauss-Hermite samples (reference: rollout.jl).
- Adjoint-mode gradients of the rollout policy, obtained here with two
  custom_vjp rules (sample-path draw semantics + implicit-function-theorem
  on the inner argmax) and jax.grad through a lax.scan, instead of the
  reference's hand-rolled back-substitution (rollout.jl:126-277).
- Stochastic gradient ascent (SGA/Adam) of the rollout acquisition with
  the Mahsereci et al. early-stopping statistic (utils.jl:114-123).
- Myopic baselines (EI/POI/LCB/random) and the synthetic test-function
  suite (testfns.jl).

Parallelism: MC trajectories x multistarts x SGA restarts are sharded over
a jax.sharding.Mesh; cross-device reductions ride XLA collectives.

Numerics note: TPU matmuls default to bfloat16 accumulation, which loses
~8 mantissa bits — enough to push the GP joint predictive covariance
S = k(x,x) - K_xX K^{-1} K_Xx outside the PD cone past its jitter, at
which point chol(S) is NaN and one poisoned MC lane NaNs the whole
acquisition mean (observed on trid10d at mc=200). Every matrix product in
this package is tiny (capacity ~1e2), so full-precision accumulation costs
nothing; we set the matmul default to "highest" at import. Override via
ROLLOUT_BO_TPU_MATMUL_PRECISION (e.g. "default", "float32", "highest").
"""

import os as _os

import jax as _jax

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("ROLLOUT_BO_TPU_MATMUL_PRECISION", "highest"),
)

# Optional backend override (e.g. ROLLOUT_BO_TPU_PLATFORM=cpu for running
# the experiment CLIs on host while a TPU job owns the chip). Needed
# because some environments pin the platform before JAX_PLATFORMS is read.
if "ROLLOUT_BO_TPU_PLATFORM" in _os.environ:
    _jax.config.update("jax_platforms", _os.environ["ROLLOUT_BO_TPU_PLATFORM"])

from rollout_bo_tpu import constants, ops, models, rollout, parallel, utils

__version__ = "0.1.0"

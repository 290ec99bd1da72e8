from rollout_bo_tpu.ops import kernels, chol, qmc, quadrature
from rollout_bo_tpu.ops.kernels import (
    RBFKernel,
    matern52,
    matern32,
    matern12,
    squared_exponential,
    periodic,
)

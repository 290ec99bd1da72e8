from rollout_bo_tpu.rollout import (
    solvers,
    bo,
    trajectory,
    observables,
    mc,
    outer,
    trust_region,
    adjoint,
)
from rollout_bo_tpu.rollout.adjoint import gradient_adjoint
from rollout_bo_tpu.rollout.trajectory import (
    TrajectoryParams,
    TrajectoryRecord,
    ExpectedTrajectoryOutput,
    rollout_trajectory,
    trajectory_reward,
)
from rollout_bo_tpu.rollout.mc import (
    simulate_trajectory_mc,
    simulate_trajectory_ghq,
    simulate_trajectory_deterministic,
)

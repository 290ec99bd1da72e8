from rollout_bo_tpu.models import (
    decision_rules,
    surrogate,
    fantasy,
    perturbation,
    testfns,
    cost_functions,
)
from rollout_bo_tpu.models.decision_rules import EI, POI, LCB, RandomAcquisition, DecisionRule
from rollout_bo_tpu.models.cost_functions import (
    CostAwareRule,
    GaussianProcessCost,
    NonUniformCost,
    UniformCost,
    UnitCost,
    cost_aware,
)
from rollout_bo_tpu.models.surrogate import SurrogateState, fit, condition, posterior
from rollout_bo_tpu.models.testfns import get_function, TestFunction

"""Cost-aware experiment CLI: flag wiring and artifact schema.

Pins the cost-aware rollout experiment (BASELINE configs[3]:
"StochasticObservable rollouts with non-uniform cost functions"; the
reference only aspires to this, README.md:21-26) end to end on a tiny
config: the CLI must run cost_aware(EI, NonUniformCost) rollouts and
write the reference-schema CSVs plus the per-iteration costs table.
"""

import numpy as np
import jax.numpy as jnp

from rollout_bo_tpu.experiments import cost_aware as ca
from rollout_bo_tpu.models import cost_functions as cf
from rollout_bo_tpu.models import testfns
from rollout_bo_tpu.utils import logging as log


def test_cost_aware_cli_nonuniform(tmp_path):
    out = str(tmp_path)
    ca.main([
        "--function-name", "braninhoo", "--output-dir", out,
        "--trials", "2", "--budget", "2", "--horizon", "1",
        "--mc-samples", "2", "--starts", "2", "--batch-size", "2",
        "--sgd-iterations", "1", "--modes", "nonuniform",
    ])
    base = tmp_path / "braninhoo"
    gaps = log.read_rows(str(base / "nonuniform_rollout_h1_gaps"))
    costs = log.read_rows(str(base / "nonuniform_costs"))
    assert gaps.shape == (2, 2) and costs.shape == (2, 2)
    # the synthetic cost surface is >= 1 everywhere and peaks at 1 + amp
    assert np.all(costs >= 1.0) and np.all(costs <= 1.0 + 3.0 + 1e-6)
    assert (base / "metadata.txt").exists()


def test_build_rule_modes():
    f = testfns.get_function("braninhoo")
    c = ca.make_true_cost(f, "braninhoo", 3.0, 2.0)
    # the cost peaks at the expensive minimizer and decays to ~1 far away
    assert float(c(jnp.asarray([np.pi, 2.275]))) > 3.9
    assert float(c(jnp.asarray([-5.0, 14.0]))) < 1.1
    for mode in ("uniform", "nonuniform", "gp"):
        rule = ca.build_rule(mode, c, f, 8, 0, jnp.float32)
        assert isinstance(rule, cf.CostAwareRule) and rule.name == "EI"
        assert rule.cost is not None
    assert ca.build_rule("uniform", c, f, 8, 0, jnp.float32).cost.uniform

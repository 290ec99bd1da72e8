"""Sharded rollout-acquisition evaluation and outer policy optimization.

The single-device estimators (rollout/mc.py, rollout/outer.py) are pure
jnp programs; here their batch inputs are placed with NamedShardings on a
('restarts', 'mc') mesh and jitted with matching out_shardings — XLA
GSPMD splits the vmapped trajectory lanes across devices and turns the
mean/std reductions (rollout.jl:328-339's Distributions.mean/std) into
psum collectives over ICI, and the restart-winner argmax
(rbf_optim.jl:97-98's findmin) into an all-reduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rollout_bo_tpu.models import surrogate as sg
from rollout_bo_tpu.models.decision_rules import DecisionRule
from rollout_bo_tpu.parallel import mesh as mesh_mod
from rollout_bo_tpu.rollout import mc as mc_mod
from rollout_bo_tpu.rollout import outer as outer_mod
from rollout_bo_tpu.rollout.trajectory import TrajectoryParams

__all__ = [
    "sharded_simulate_mc",
    "sharded_stochastic_solve_batch",
    "sharded_stochastic_solve_fused",
    "sharded_stochastic_solve_scanned",
]


def sharded_simulate_mc(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    mesh: Mesh,
    *,
    with_gradients: bool = True,
    iterations: int = 12,
    draw_mode: str = "reparam",
):
    """simulate_trajectory_mc with the MC axis sharded over mesh axis 'mc'.

    tp.rnstream's leading (mc_iters) axis is split across devices; the
    output statistics are replicated (XLA inserts the cross-device mean
    reductions).
    """
    rn = jax.device_put(tp.rnstream, NamedSharding(mesh, P(("restarts", "mc"), None, None)))
    tp = tp._replace(rnstream=rn)
    state = mesh_mod.replicate(state, mesh)

    fn = jax.jit(
        lambda st, tpx: mc_mod.simulate_trajectory_mc(
            st, tpx, rule, xstarts,
            with_gradients=with_gradients, iterations=iterations,
            draw_mode=draw_mode,
        ),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn(state, tp)


def sharded_stochastic_solve_batch(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    mesh: Mesh,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
):
    """Outer multi-restart SGA with restarts sharded over mesh axis 'restarts'.

    Each restart runs its Adam/eswavs loop independently on its shard;
    returns (xs, values) replicated. Selecting jnp.argmax(values) on the
    result is the reference's distributed winner reduction
    (adaptive_bayesopt.jl:483-488) as an XLA collective.
    """
    starts = jax.device_put(
        jnp.asarray(starts, state.X.dtype), NamedSharding(mesh, P("restarts", None))
    )
    state = mesh_mod.replicate(state, mesh)

    fn = jax.jit(
        lambda st, s: outer_mod.stochastic_solve_batch(
            st, tp, rule, xstarts, s,
            max_iters=max_iters, lr=lr,
            inner_iterations=inner_iterations, draw_mode=draw_mode,
        ),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn(state, starts)


def sharded_stochastic_solve_fused(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    mesh: Mesh,
    *,
    max_iters: int = 50,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
    program=None,
):
    """The fused one-dispatch (production/bench) outer solver on a mesh.

    Restarts shard over mesh axis 'restarts' and the MC trajectory axis
    over 'mc' simultaneously — the two embarrassingly-parallel axes of the
    reference's intended fan-out (adaptive_bayesopt.jl:483-488). The fused
    program carries no sharding annotations: GSPMD propagates the input
    placements through the while_loop body and inserts the per-restart mean
    reductions over 'mc' plus the all-reduce behind the device-side
    all-stopped early-exit predicate.
    """
    starts = jax.device_put(
        jnp.asarray(starts, state.X.dtype), NamedSharding(mesh, P("restarts", None))
    )
    rn = jax.device_put(tp.rnstream, NamedSharding(mesh, P("mc", None, None)))
    tp = tp._replace(rnstream=rn)
    state = mesh_mod.replicate(state, mesh)
    prog = program or outer_mod.make_fused_sga_program(
        state, tp, rule, xstarts, max_iters=max_iters, lr=lr,
        inner_iterations=inner_iterations, draw_mode=draw_mode,
    )
    return prog(state, tp.rnstream, starts)


def sharded_stochastic_solve_scanned(
    state: sg.SurrogateState,
    tp: TrajectoryParams,
    rule: DecisionRule,
    xstarts,
    starts,
    mesh: Mesh,
    *,
    max_iters: int = 50,
    steps_per_call: int = 10,
    lr: float = 0.01,
    inner_iterations: int = 12,
    draw_mode: str = "reparam",
    program=None,
):
    """The scanned (production/bench) outer solver on a device mesh.

    Restarts shard over mesh axis 'restarts' and the MC trajectory axis
    over 'mc' simultaneously — the two embarrassingly-parallel axes of the
    reference's intended fan-out (adaptive_bayesopt.jl:483-488). The
    scanned program itself carries no sharding annotations: GSPMD
    propagates the input placements through the lax.scan and inserts the
    per-restart mean reductions over the 'mc' axis and the all-gather for
    the host-side all-stopped early-exit check between windows.
    """
    starts = jax.device_put(
        jnp.asarray(starts, state.X.dtype), NamedSharding(mesh, P("restarts", None))
    )
    rn = jax.device_put(tp.rnstream, NamedSharding(mesh, P("mc", None, None)))
    tp = tp._replace(rnstream=rn)
    state = mesh_mod.replicate(state, mesh)
    return outer_mod.stochastic_solve_scanned(
        state, tp, rule, xstarts, starts,
        max_iters=max_iters, steps_per_call=steps_per_call, lr=lr,
        inner_iterations=inner_iterations, draw_mode=draw_mode,
        program=program,
    )

"""Non-myopic (rollout) BO experiment CLI.

Mirrors `/root/reference/experiments/nonmyopic_bayesopt.jl` flags (:4-74)
and the intended rollout BO loop (the reference's driver loop is stale —
SURVEY.md §0; the live semantics are implemented in
rollout_bo_tpu.rollout.bo.run_nonmyopic_bo). Outputs
rollout_h{H}_{times,gaps,observations}.csv in the reference's archived
schema (experiments/archived/nonmyopic-shortrun-timing).

--nworkers maps to the device count: restarts are sharded over a
('restarts','mc') mesh when more than one device is available.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from rollout_bo_tpu.models import decision_rules as dr
from rollout_bo_tpu.models import testfns
from rollout_bo_tpu.rollout import bo
from rollout_bo_tpu.utils import logging as log


def parse_args(argv=None):
    p = argparse.ArgumentParser("Nonmyopic Bayesian Optimization CLI")
    p.add_argument("--nworkers", type=int, default=0,
                   help="devices to use (0 = all); restarts shard across them")
    p.add_argument("--seed", type=int, default=1906)
    p.add_argument("--optimize", action="store_true",
                   help="optimize surrogate hyperparameters each iteration")
    p.add_argument("--starts", type=int, default=16)
    p.add_argument("--trials", type=int, default=60)
    p.add_argument("--budget", type=int, default=15)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--mc-samples", type=int, default=200)
    p.add_argument("--horizon", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=8,
                   help="outer SGA restarts per BO iteration")
    p.add_argument("--function-name", required=True)
    p.add_argument("--sgd-iterations", type=int, default=50)
    p.add_argument("--variance-reduction", action="store_true",
                   help="use low-discrepancy (QMC) trajectory streams")
    p.add_argument("--log10-parity", action="store_true",
                   help="reproduce the reference's Box-Muller log10 quirk "
                        "(utils.jl:33-35): QMC fantasy draws get std "
                        "log10(e)^0.5 ~ 0.659 instead of 1. The reference's "
                        "archived variance-reduction runs all carry this "
                        "quirk, so regret-parity runs should pass it")
    p.add_argument("--solve-f-tol", type=float, default=0.0,
                   help="IPNewton-style loose acceptance for the INNER "
                        "(fantasy-step EI) solves: the reference applies "
                        "Optim.Options(x_tol=f_tol=1e-3) to every inner "
                        "solve (rbf_optim.jl:26-30), ours are tight by "
                        "default; nonzero sets solve_f_tol=solve_x_tol on "
                        "the rollout rule")
    p.add_argument("--deterministic-solve", action="store_true",
                   help="SAA/Gauss-Hermite solver instead of MC "
                        "(reference utils.jl:267-306)")
    p.add_argument("--ghq-nodes", type=int, default=8)
    p.add_argument("--dtype", default="float64", choices=["float32", "float64"])
    p.add_argument("--outer-solver", default="fused",
                   choices=["fused", "batch", "scanned"],
                   help="fused = whole multi-restart SGA solve as ONE device "
                        "program with exact on-device early exit (the bench "
                        "production path); scanned = k SGA iterations fused "
                        "per dispatch with host-side early exit")
    p.add_argument("--steps-per-call", type=int, default=10,
                   help="SGA iterations fused per dispatch (scanned solver)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="snapshot the trial every N iterations (0 = off); a "
                        "crashed run resumes from the last snapshot")
    p.add_argument("--initial-observations", type=int, default=5,
                   help="initial uniform samples per trial: 5 matches the "
                        "reference nonmyopic driver "
                        "(nonmyopic_bayesopt.jl:133); its ARCHIVED "
                        "rollout_h* data was produced by the adaptive "
                        "driver with ONE initial observation per trial "
                        "(adaptive_bayesopt.jl:496) — pass 1 to compare "
                        "against those CSVs")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    f = testfns.get_function(args.function_name)
    outdir = os.path.join(args.output_dir, args.function_name)
    os.makedirs(outdir, exist_ok=True)
    log.write_metadata(
        os.path.dirname(outdir) or outdir,
        budget=args.budget, number_of_trials=args.trials,
        number_of_starts=args.starts, data_directory=args.output_dir,
        should_optimize=args.optimize, horizon=args.horizon,
        mc_samples=args.mc_samples, batch_size=args.batch_size,
        sgd_iterations=args.sgd_iterations,
        should_reduce_variance=args.variance_reduction,
        log10_parity=args.log10_parity,
    )

    h = args.horizon
    for metric in ["times", "gaps", "observations"]:
        log.create_csv(os.path.join(outdir, f"rollout_h{h}_{metric}"), args.budget)

    mesh = None
    ndev = len(jax.devices()) if args.nworkers == 0 else args.nworkers
    if ndev > 1 and args.batch_size % ndev == 0:
        from rollout_bo_tpu.parallel import mesh as mesh_mod
        mesh = mesh_mod.make_mesh(jax.devices()[:ndev], restarts=ndev, mc=1)

    rng = np.random.default_rng(args.seed)
    # crash-resume: skip trials that already hold a CSV row (create_csv
    # keeps existing rows) instead of recomputing and appending duplicates
    done_trials = 0
    if args.checkpoint_every:
        done_trials = len(log.read_rows(os.path.join(outdir, f"rollout_h{h}_gaps")))
        if done_trials:
            print(f"resuming: {done_trials} completed trial(s) on disk")
    n_init = args.initial_observations
    for trial in range(args.trials):
        x_init = np.asarray(f.lbs) + (np.asarray(f.ubs) - np.asarray(f.lbs)) \
            * rng.uniform(size=(n_init, f.dim))
        if trial < done_trials:
            continue  # x_init drawn anyway to keep the rng stream aligned
        t0 = time.time()
        ckpt_path = (os.path.join(outdir, f"rollout_h{h}_trial{trial}_ckpt")
                     if args.checkpoint_every else None)
        res = bo.run_nonmyopic_bo(
            f, horizon=h, mc_iters=args.mc_samples, budget=args.budget,
            n_init=n_init, num_starts=args.starts, num_restarts=args.batch_size,
            sgd_iters=args.sgd_iterations, seed=args.seed + trial,
            mle_every=1 if args.optimize else 10**9,
            use_low_discrepancy=args.variance_reduction,
            log10_parity=args.log10_parity,
            rule=(dr.DecisionRule("EI", 1e-8, args.solve_f_tol,
                                  args.solve_f_tol)
                  if args.solve_f_tol else dr.EI()),
            x_init=x_init, mesh=mesh,
            deterministic=args.deterministic_solve, ghq_nodes=args.ghq_nodes,
            outer_solver=args.outer_solver, steps_per_call=args.steps_per_call,
            checkpoint_path=ckpt_path,
            checkpoint_every=args.checkpoint_every or 5,
        )
        if ckpt_path is not None and os.path.exists(ckpt_path + ".npz"):
            os.remove(ckpt_path + ".npz")  # completed trial: drop snapshot
        log.write_to_csv(os.path.join(outdir, f"rollout_h{h}_times"), res.times)
        log.write_to_csv(os.path.join(outdir, f"rollout_h{h}_gaps"), res.gaps)
        log.write_to_csv(os.path.join(outdir, f"rollout_h{h}_observations"),
                         res.y[-args.budget:])
        print(f"trial {trial + 1}/{args.trials}: final gap {res.gaps[-1]:.3f} "
              f"mean iter {res.times.mean():.2f}s total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()

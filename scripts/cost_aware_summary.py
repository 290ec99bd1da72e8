"""Summarize the cost-aware rollout artifact (results/cost_aware).

Prints, per cost mode, mean final gap and mean cumulative evaluation
cost with trial-noise SEs — the evidence row for PARITY.md: a cost-aware
run should reach comparable gap at LOWER cumulative cost than the
cost-blind baseline (the synthetic cost surface peaks at one of
braninhoo's three global minimizers, so the cost-aware policy can steer
to a cheap one).

Run:  python scripts/cost_aware_summary.py [--dir results/cost_aware]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_report import load_rows  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="results/cost_aware")
    p.add_argument("--function-name", default="braninhoo")
    p.add_argument("--horizon", type=int, default=1)
    args = p.parse_args(argv)
    base = os.path.join(args.dir, args.function_name)

    print(f"{'mode':<12} {'final gap':>14} {'cum cost':>14} {'n':>3}")
    rows_out = []
    for mode in ("uniform", "nonuniform", "gp"):
        gaps = load_rows(os.path.join(
            base, f"{mode}_rollout_h{args.horizon}_gaps.csv"))
        costs = load_rows(os.path.join(base, f"{mode}_costs.csv"))
        if gaps is None or costs is None:
            continue
        fg = np.asarray([r[-1] for r in gaps])
        cc = np.asarray([sum(r) for r in costs])
        n = len(fg)
        print(f"{mode:<12} {fg.mean():>7.3f}±{fg.std(ddof=1)/np.sqrt(n):<5.3f}"
              f" {cc.mean():>8.2f}±{cc.std(ddof=1)/np.sqrt(n):<4.2f} {n:>3}")
        rows_out.append((mode, fg.mean(), cc.mean()))
    if len(rows_out) >= 2:
        base_cost = dict((m, c) for m, _, c in rows_out)["uniform"]
        for mode, g, c in rows_out:
            if mode != "uniform":
                print(f"{mode}: {100 * (base_cost - c) / base_cost:+.1f}% "
                      f"cumulative-cost SAVINGS vs the cost-blind "
                      f"uniform baseline")


if __name__ == "__main__":
    main()

"""Measured analysis: the reference's archived nonmyopic winner selection
is degenerate (center-seeded), not an acquisition argmax.

The archived nonmyopic data was produced by `distributed_stochastic_
rollout_solver` — deleted from the reference tree (SURVEY §0; the
driver's SharedArray fan-out calls undefined functions). Its outputs
contradict the reference's own live acquisition semantics:

1. **Iteration-1 choices sit at the exact domain center** on every
   large-domain function (center distance 0.2-2.7% of the half-diagonal
   on ackley2d/schwefel10d/trid10d, 30/30 trials each) — the first
   Sobol candidate of `generate_batch` (utils.jl:97-106) is the center,
   so this is "first candidate + small SGA march", not an argmax over
   the batch.
2. **At d=1 (gramacylee) the iteration-1 choice is always the domain
   boundary farther from the initial sample** (30/30) — the center
   candidate marched ~1.0 (half the domain) along the away-from-data
   acquisition gradient until the box clips it.
3. **Iteration-2+ choices stay near the center although the far field
   dominates EI under the reference's own model.** With its protocol GP
   (zero mean, unit amplitude, Matern52, MLE lengthscale <= 5) and all
   observations y in [16, 22] (ackley2d), far-field EI ~ fmini ~ 16
   while EI near the already-observed center is orders of magnitude
   smaller; a correct argmax cannot choose the center. This script
   computes both numbers per trial from the archived observations.

Consequence for parity: on functions whose optimum happens to sit at
the center (ackley2d: gap 0.999 every trial) or next to a boundary at
d=1 (gramacylee: xopt 0.548 vs marched boundary 0.5), the artifact is
fortuitously IDEAL and the archived regret is not reproducible by any
correct acquisition argmax — ours or the reference's own live code.
The parity gate annotates those cells instead of failing them
(REF_ARTIFACT in scripts/parity_report.py).

Run:  python scripts/ref_center_artifact.py [--ref /root/reference]
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCH = "experiments/archived/nonmyopic-shortrun-timing/nonmyopic_bayesopt"
DOMS = {
    "gramacylee": (1, 0.5, 2.5),
    "ackley2d": (2, -32.768, 32.768),
    "styblinskitang4d": (4, -5.0, 5.0),
    "schwefel10d": (10, -500.0, 500.0),
    "trid10d": (10, -100.0, 100.0),
    "styblinskitang10d": (10, -5.0, 5.0),
}


def ref_trials(path, d):
    """Archived observations CSV: per trial, d X-rows then one y-row
    (write_observations_to_csv, adaptive_bayesopt.jl:298-315), each with
    a leading trial-number column."""
    rows = []
    for r in list(csv.reader(open(path)))[1:]:
        try:
            v = [float(x) for x in r if x != ""]
        except ValueError:
            continue
        if not v or v[0] < 0:
            continue
        rows.append(np.asarray(v[1:]))
    out = []
    for i in range(0, len(rows) - d, d + 1):
        out.append((np.stack(rows[i:i + d]), rows[i + d]))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default="/root/reference")
    args = p.parse_args(argv)

    print("== 1. iteration-1 chosen point: distance from the domain center "
          "(fraction of half-diagonal; uniform-random would be ~0.5) ==")
    print(f"{'function':<18} {'h':>2} {'median':>8} {'max':>8} {'n':>4}")
    for fn, (d, lo, hi) in DOMS.items():
        for h in range(4):
            path = os.path.join(args.ref, ARCH, fn,
                                f"rollout_h{h}_observations.csv")
            if not os.path.exists(path):
                continue
            tr = ref_trials(path, d)
            center = 0.5 * (lo + hi)
            half_diag = 0.5 * (hi - lo) * np.sqrt(d)
            d1 = [np.linalg.norm(X[:, 1] - center) / half_diag for X, _ in tr]
            print(f"{fn:<18} {h:>2} {np.median(d1):>8.3f} {np.max(d1):>8.3f} "
                  f"{len(tr):>4}")

    print("\n== 2. gramacylee d=1: iteration-1 choice vs initial sample ==")
    for h in range(4):
        tr = ref_trials(os.path.join(args.ref, ARCH, "gramacylee",
                                     f"rollout_h{h}_observations.csv"), 1)
        at_boundary = sum(1 for X, _ in tr
                          if min(X[0, 1] - 0.5, 2.5 - X[0, 1]) < 0.02)
        far_side = sum(1 for X, _ in tr if (X[0, 1] > 1.5) == (X[0, 0] < 1.5))
        print(f"h={h}: at a domain boundary {at_boundary}/{len(tr)}; "
              f"boundary farther from the initial sample {far_side}/{len(tr)}")

    print("\n== 3. ackley2d h=0 iteration-2: EI(far corner) vs EI(reference's "
          "chosen point) under the reference's own protocol GP ==")
    os.environ.setdefault("ROLLOUT_BO_TPU_PLATFORM", "cpu")
    import jax.numpy as jnp
    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K

    tr = ref_trials(os.path.join(args.ref, ARCH, "ackley2d",
                                 "rollout_h0_observations.csv"), 2)
    rule = EI()
    theta = jnp.zeros((1,))
    ratios = []
    for X, y in tr:
        # observations available before the iteration-2 solve
        st = sg.fit(K.matern52((5.0,)), X[:, :2].T, y[:2], capacity=4,
                    noise=1e-6)
        corner = jnp.asarray([-32.668, -32.668])
        chosen = jnp.asarray(X[:, 2])
        ei_far = float(sg.acquisition(st, rule, corner, theta))
        ei_chosen = float(sg.acquisition(st, rule, chosen, theta))
        ratios.append(ei_far / max(ei_chosen, 1e-12))
    ratios = np.asarray(ratios)
    print(f"EI(far)/EI(chosen): median {np.median(ratios):.1f}, "
          f"min {ratios.min():.1f} over {len(ratios)} trials "
          f"(every trial >> 1 => the archived selection is not an "
          f"acquisition argmax)")

    print("\n== 4. gramacylee h=3 residual decomposition: final gap "
          "conditioned on an early left-boundary probe ==")
    # f(0.5) = 0.0625 exactly identifies a left-boundary observation;
    # the optimum x*=0.5486 sits 0.048 inside that boundary in a narrow
    # (~0.1-wide) sine basin. A trial that spends an early sample at the
    # boundary lowers fmini to 0.0625 and flattens EI near the basin.
    FB = 0.0625
    from parity_report import final_gaps  # noqa: E402 (same scripts/ dir)

    def probe_mask(ys_rows, k=4, tol=1e-3):
        return np.array([np.any(np.abs(r[1:1 + k] - FB) < tol)
                         for r in ys_rows])

    ref_tr3 = ref_trials(os.path.join(args.ref, ARCH, "gramacylee",
                                      "rollout_h3_observations.csv"), 1)
    ref_ys = np.stack([y for _, y in ref_tr3])
    ref_g = final_gaps(os.path.join(args.ref, ARCH, "gramacylee",
                                    "rollout_h3_gaps.csv"), ref_archived=True)
    ours_p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results/nonmyopic/gramacylee")
    rows = []
    for r in csv.reader(open(os.path.join(ours_p,
                                          "rollout_h3_observations.csv"))):
        try:
            v = [float(x) for x in r if x != ""]
        except ValueError:
            continue
        if not v or all(x == -1.0 for x in v):
            continue
        rows.append(np.asarray(v))
    ours_ys = np.stack(rows)
    ours_g = final_gaps(os.path.join(ours_p, "rollout_h3_gaps.csv"))
    for name, ys, g in (("ref", ref_ys, ref_g), ("ours", ours_ys, ours_g)):
        m = probe_mask(ys)
        pm = g[m].mean() if m.any() else float("nan")
        nm_ = g[~m].mean() if (~m).any() else float("nan")
        print(f"{name:<5} n={len(g)}  early-boundary-probe trials "
              f"{int(m.sum()):>2}  gap|probe {pm:.3f}  gap|noprobe {nm_:.3f}"
              f"  overall {g.mean():.3f}")
    print("(ours probes the boundary 4x as often and those trials end "
          "~0.13 lower: the residual h3 deficit is an exploration-"
          "allocation difference concentrated in boundary-probed trials, "
          "not a uniform acquisition-quality gap)")


if __name__ == "__main__":
    main()

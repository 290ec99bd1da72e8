#!/usr/bin/env bash
# Nonmyopic (rollout) sweep (reference experiments/scripts/run_nonmyopic.sh).
set -euo pipefail
OUT="${1:-results/nonmyopic}"
HORIZON="${2:-1}"

nonmyopic_configurations=(
    "--function-name ackley5d --budget 100 --starts 64 --trials 60 --mc-samples 5"
    "--function-name braninhoo --budget 100 --starts 64 --trials 60 --mc-samples 5"
    "--function-name hartmann6d --budget 100 --starts 64 --trials 60 --mc-samples 5"
    "--function-name sixhump --budget 100 --starts 64 --trials 60 --mc-samples 5"
    "--function-name levy10d --budget 100 --starts 64 --trials 60 --mc-samples 5"
    "--function-name goldsteinprice --budget 100 --starts 64 --trials 60 --mc-samples 5"
    "--function-name griewank3d --budget 100 --starts 64 --trials 60 --mc-samples 5"
)

for config in "${nonmyopic_configurations[@]}"; do
  python -m rollout_bo_tpu.experiments.nonmyopic $config \
      --horizon "$HORIZON" --variance-reduction --output-dir "$OUT"
done

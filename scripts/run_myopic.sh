#!/usr/bin/env bash
# Myopic baseline sweep (reference experiments/scripts/run_myopic.sh).
set -euo pipefail
OUT="${1:-results/myopic}"

myopic_configurations=(
    "--function-name ackley5d --budget 100 --starts 64 --trials 60"
    "--function-name braninhoo --budget 100 --starts 64 --trials 60"
    "--function-name hartmann6d --budget 100 --starts 64 --trials 60"
    "--function-name sixhump --budget 100 --starts 64 --trials 60"
    "--function-name levy10d --budget 100 --starts 64 --trials 60"
    "--function-name goldsteinprice --budget 100 --starts 64 --trials 60"
    "--function-name griewank3d --budget 100 --starts 64 --trials 60"
)

for config in "${myopic_configurations[@]}"; do
  python -m rollout_bo_tpu.experiments.myopic $config --output-dir "$OUT"
done

#!/bin/bash
# Round-4 parity queue A: rerun every nonmyopic horizon ladder with the
# ARCHIVED protocol (ONE initial observation per trial,
# adaptive_bayesopt.jl:496 — round-3 data used the nonmyopic driver's 5,
# which systematically deflates gaps; see results/nonmyopic_ninit5/).
# Adds the three BASELINE §6.2 functions that had no ladder yet
# (styblinskitang4d, schwefel10d, styblinskitang10d) and runs the small-d
# functions at 30 trials (their gap distributions are bimodal at 10).
# Serial against the single TPU chip.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

NM () { # fn horizon trials timeout
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --optimize --dtype float32 \
    --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic \
    > "$LOGDIR/r4_nonmyopic_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) $FN h=$H rc=$?"
}

for H in 0 1 2 3; do NM trid10d          $H 10 2400; done
for H in 0 1 2 3; do NM styblinskitang4d $H 10 2400; done
for H in 0 1 2 3; do NM schwefel10d      $H 10 2400; done
for H in 0 1 2 3; do NM styblinskitang10d $H 10 2400; done
for H in 0 1 2 3; do NM gramacylee       $H 30 2400; done
for H in 0 1 2 3; do NM ackley2d         $H 30 2400; done
echo QUEUE-A-DONE

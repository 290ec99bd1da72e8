#!/bin/bash
# Round-5 phase-1b: the loose-acceptance gramacylee h3 probe (reference
# rbf_optim.jl:26-30 applies f_tol=x_tol=1e-3 to EVERY inner rollout
# solve; the ladder default is tight), then the GHQ ladder, then chains
# into phase 2.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

timeout 1200 $PY -m rollout_bo_tpu.experiments.nonmyopic \
  --function-name gramacylee --horizon 3 --trials 30 --budget 15 \
  --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
  --variance-reduction --log10-parity --solve-f-tol 1e-3 --optimize \
  --dtype float32 --initial-observations 1 --checkpoint-every 5 \
  --output-dir results/probe_loose \
  > $LOGDIR/r5_loose_gramacylee_h3.log 2>&1
echo "$(date +%H:%M:%S) loose gramacylee h3 rc=$?" >> $LOGDIR/R5_QUEUE_STATUS

GHQ () { # fn horizon trials timeout
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --deterministic-solve --ghq-nodes 8 --log10-parity --optimize \
    --dtype float32 --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic_ghq \
    > "$LOGDIR/r5_ghq_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) ghq $FN h=$H rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
}
for H in 0 1 2; do GHQ gramacylee $H 30 1200; done
echo "$(date +%H:%M:%S) GHQ-DONE" >> $LOGDIR/R5_QUEUE_STATUS

exec bash scripts/parity_queue_r5_phase2.sh

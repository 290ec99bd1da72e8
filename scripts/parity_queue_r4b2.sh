#!/bin/bash
# Round-4 queue B2 (reordered remainder of r4b after its GHQ h=1 remote
# compile stalled): myopic grid completion first, GHQ h=1..2 last.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

for FN in sixhump braninhoo; do
  timeout 3000 $PY -m rollout_bo_tpu.experiments.myopic \
    --function-name $FN --trials 30 --budget 100 --starts 64 \
    --acquisitions ei lcb random --dtype float32 --checkpoint-every 50 \
    --output-dir results/myopic > $LOGDIR/r4_myopic_$FN.log 2>&1
  echo "$(date +%H:%M:%S) myopic $FN rc=$?"
done
for FN in goldsteinprice griewank3d ackley5d hartmann6d levy10d; do
  timeout 3000 $PY -m rollout_bo_tpu.experiments.myopic \
    --function-name $FN --trials 30 --budget 100 --starts 64 \
    --acquisitions ei --dtype float32 --checkpoint-every 50 \
    --output-dir results/myopic > $LOGDIR/r4_myopic_${FN}_ei30.log 2>&1
  echo "$(date +%H:%M:%S) myopic $FN ei-30 rc=$?"
done

for H in 1 2; do
  timeout 2400 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name gramacylee --horizon $H --trials 10 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --deterministic-solve --ghq-nodes 8 --optimize --dtype float32 \
    --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic_ghq \
    > $LOGDIR/r4_ghq_gramacylee_h$H.log 2>&1
  echo "$(date +%H:%M:%S) ghq gramacylee h=$H rc=$?"
done
echo QUEUE-B2-DONE

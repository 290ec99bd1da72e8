#!/bin/bash
# Round-5 CPU queue: extend the four thin myopic POI cells to 30 trials
# (f64 + IPNewton-loose acceptance on CPU — the POI-parity protocol,
# see PARITY.md / memory: exact argmax worsens POI regret). Launched
# only after the chip queue's timing-sensitive phases (ladders + GHQ)
# are done, to keep the 2-core host free for the chip tunnel client.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
export ROLLOUT_BO_TPU_PLATFORM=cpu
LOGDIR=results/logs; mkdir -p $LOGDIR
for FN in goldsteinprice griewank3d ackley5d levy10d; do
  timeout 9000 $PY -m rollout_bo_tpu.experiments.myopic \
    --function-name $FN --trials 30 --budget 100 --starts 64 \
    --acquisitions poi --dtype float64 --checkpoint-every 50 \
    --output-dir results/myopic > $LOGDIR/r5_myopic_${FN}_poi30.log 2>&1
  echo "$(date +%H:%M:%S) poi $FN rc=$?"
done
echo POI-QUEUE-DONE

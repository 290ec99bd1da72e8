#!/bin/bash
# Round-3c: dimension-scaling ladder, mirroring the reference's archived
# dimensions-timing configuration (metadata.txt: budget 15, 4 trials,
# 8 starts, horizon 3, 200 MC, batch 8, 50 SGD iters, QMC variance
# reduction) on ackley in d = 1, 4, 8, 16. ackley2d already has 10-trial
# data from the shortrun ladder. Serial against the single TPU chip.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

for D in 1 4 8 16; do
  timeout 1800 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name ackley${D}d --horizon 3 --trials 4 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --optimize --dtype float32 \
    --output-dir results/dimensions \
    > $LOGDIR/dimensions_ackley${D}d_h3.log 2>&1
  echo "ackley${D}d h=3 rc=$?"
done
echo QUEUE-DONE

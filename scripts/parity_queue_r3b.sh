#!/bin/bash
# Round-3b parity queue: extend regret parity to the remaining BASELINE
# functions. trid10d is the headline timing function (BASELINE §6.2:
# 309.4 s/iter at h=3) — run its full horizon ladder first, then the
# three myopic functions without parity data yet (hartmann6d, ackley5d,
# levy10d). Serial against the single TPU chip.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

for H in 3 2 1 0; do
  timeout 2000 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name trid10d --horizon $H --trials 10 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --optimize --dtype float32 \
    --output-dir results/nonmyopic > $LOGDIR/nonmyopic_trid10d_h$H.log 2>&1
  echo "trid10d h=$H rc=$?"
done

for FN in hartmann6d ackley5d levy10d; do
  timeout 1500 $PY -m rollout_bo_tpu.experiments.myopic \
    --function-name $FN --trials 10 --budget 100 --starts 64 \
    --dtype float32 --output-dir results/myopic \
    > $LOGDIR/myopic_$FN.log 2>&1
  echo "myopic $FN rc=$?"
done
echo QUEUE-DONE

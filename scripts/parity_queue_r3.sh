#!/bin/bash
# Round-3 parity queue: runs serially against the single TPU chip.
# Nonmyopic horizon ladder (gramacylee h=1..3) to pair with the existing
# h=0 results, then two more myopic functions, then ackley2d ladder.
set -u
cd /root/repo
LOGDIR=results/logs; mkdir -p $LOGDIR

for H in 1 2 3; do
  timeout 2700 python -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name gramacylee --horizon $H --trials 10 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --optimize --dtype float32 \
    --output-dir results/nonmyopic > $LOGDIR/nonmyopic_gramacylee_h$H.log 2>&1
  echo "gramacylee h=$H rc=$?"
done

for FN in goldsteinprice griewank3d; do
  timeout 2700 python -m rollout_bo_tpu.experiments.myopic \
    --function-name $FN --trials 10 --budget 100 --starts 64 \
    --dtype float32 --output-dir results/myopic \
    > $LOGDIR/myopic_$FN.log 2>&1
  echo "myopic $FN rc=$?"
done

for H in 0 1 2 3; do
  timeout 2700 python -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name ackley2d --horizon $H --trials 10 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --optimize --dtype float32 \
    --output-dir results/nonmyopic > $LOGDIR/nonmyopic_ackley2d_h$H.log 2>&1
  echo "ackley2d h=$H rc=$?"
done
echo QUEUE-DONE

#!/bin/bash
# Round-4 parity queue B (runs after r4a): h=4 ladders, the GHQ /
# deterministic-solve ladder, and the myopic grid completion.
# Serial against the single TPU chip.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

# -- h=4 vs data-for-various-horizons-backup (its metadata: budget 15,
#    8 starts, 50 MC samples, batch 8, 50 SGD iters, NO variance
#    reduction, 1 initial observation) --
for FN in gramacylee ackley4d; do
  timeout 3000 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name $FN --horizon 4 --trials 10 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 50 --sgd-iterations 50 \
    --optimize --dtype float32 --initial-observations 1 \
    --checkpoint-every 5 --output-dir results/nonmyopic_h4 \
    > $LOGDIR/r4_h4_${FN}.log 2>&1
  echo "$(date +%H:%M:%S) h4 $FN rc=$?"
done

# -- GHQ / deterministic-solve ladder (flag evidence beyond finiteness:
#    reference utils.jl:267-306; compared against the stochastic archive) --
for H in 0 1 2; do
  timeout 2400 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name gramacylee --horizon $H --trials 10 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --deterministic-solve --ghq-nodes 8 --optimize --dtype float32 \
    --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic_ghq \
    > $LOGDIR/r4_ghq_gramacylee_h$H.log 2>&1
  echo "$(date +%H:%M:%S) ghq gramacylee h=$H rc=$?"
done

# -- myopic grid completion: sixhump + braninhoo fresh 30-trial runs of
#    ei/lcb/random (poi runs in f64 on CPU in parallel), then EI extension
#    to 30 trials for the other five functions (resume counts CSV rows) --
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
echo QUEUE-B-DONE

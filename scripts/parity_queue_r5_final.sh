#!/bin/bash
# Round-5 FINAL prioritized chip queue. Strictly serial, most valuable
# first, so whatever completes by round end is the maximal-value subset:
#   1. gramacylee ladder h0-3 @30 under --log10-parity (the round-5
#      root cause: the reference's archived QMC runs fantasize with the
#      log10 Box-Muller quirk's std-0.659 draws; probe confirmed h0
#      0.602 -> 0.717 vs ref 0.750)
#   2. ackley2d ladder h0-3 @30 (same fix for the h0 |z|=2.13 residual)
#   3. GHQ gramacylee h0-2 @30 (VERDICT #8 depth)
#   4. backup-archive wide ladder (VERDICT #4): braninhoo, hartmann3d,
#      goldsteinprice, rosenbrock, rastrigin4d, mccormick h1-3 @20
#      (that archive's protocol: 50 MC, no variance reduction)
#   5. truncated/no-truncated braninhoo (VERDICT #5)
#   6. cost-aware artifact (VERDICT #7)
#   7. big-function ladders @30 log10 (trid10d first: headline fn)
# Old flag-off ladder data is archived to results/nonmyopic_noflag for
# the measured flag-on/off comparison.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

if [ ! -d results/nonmyopic_noflag ]; then
  mkdir -p results/nonmyopic_noflag
  for FN in gramacylee ackley2d trid10d styblinskitang4d schwefel10d styblinskitang10d; do
    [ -d results/nonmyopic/$FN ] && mv results/nonmyopic/$FN results/nonmyopic_noflag/$FN
  done
  cp results/nonmyopic/metadata.txt results/nonmyopic_noflag/ 2>/dev/null || true
fi
if [ ! -d results/nonmyopic_ghq_noflag ] && [ -d results/nonmyopic_ghq/gramacylee ]; then
  mkdir -p results/nonmyopic_ghq_noflag
  mv results/nonmyopic_ghq/gramacylee results/nonmyopic_ghq_noflag/
fi

NM () { # fn horizon trials timeout
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --log10-parity --optimize --dtype float32 \
    --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic \
    > "$LOGDIR/r5_nonmyopic_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) $FN h=$H rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
}

for H in 0 1 2 3; do NM gramacylee $H 30 1500; done
for H in 0 1 2 3; do NM ackley2d   $H 30 1500; done
echo "$(date +%H:%M:%S) PRIORITY-1-2-DONE" >> $LOGDIR/R5_QUEUE_STATUS

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
for H in 0 1 2; do GHQ gramacylee $H 30 1500; done
echo "$(date +%H:%M:%S) GHQ-DONE" >> $LOGDIR/R5_QUEUE_STATUS

BK () { # fn horizon trials timeout — backup-archive protocol
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 50 --sgd-iterations 50 \
    --optimize --dtype float32 --initial-observations 1 \
    --checkpoint-every 5 --output-dir results/nonmyopic_backup \
    > "$LOGDIR/r5_backup_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) backup $FN h=$H rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
}
for FN in braninhoo hartmann3d; do
  for H in 1 2 3; do BK $FN $H 20 1200; done
done
echo "$(date +%H:%M:%S) BACKUP-PHASE1-DONE" >> $LOGDIR/R5_QUEUE_STATUS

for SCHED in truncated fixed; do
  OUT=results/truncated; [ "$SCHED" = fixed ] && OUT=results/no_truncated
  timeout 1800 $PY -m rollout_bo_tpu.experiments.adaptive \
    --function-name braninhoo --horizon 1 --trials 30 --budget 20 \
    --batch-size 8 --starts 8 --mc-samples 100 --sgd-iterations 50 \
    --variance-reduction --log10-parity --optimize --dtype float32 \
    --n-init 1 --schedule $SCHED --resume --output-dir $OUT \
    > $LOGDIR/r5_${SCHED}_braninhoo.log 2>&1
  echo "$(date +%H:%M:%S) $SCHED braninhoo rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
done

timeout 2400 $PY -m rollout_bo_tpu.experiments.cost_aware \
  --function-name braninhoo --trials 15 --budget 15 --horizon 1 \
  --mc-samples 100 --starts 8 --batch-size 8 --sgd-iterations 50 \
  --optimize --variance-reduction --log10-parity --checkpoint-every 5 \
  --output-dir results/cost_aware > $LOGDIR/r5_cost_aware.log 2>&1
echo "$(date +%H:%M:%S) cost_aware rc=$?" >> $LOGDIR/R5_QUEUE_STATUS

for FN in goldsteinprice rosenbrock rastrigin4d mccormick; do
  for H in 1 2 3; do BK $FN $H 20 1200; done
done
echo "$(date +%H:%M:%S) BACKUP-DONE" >> $LOGDIR/R5_QUEUE_STATUS

for FN in trid10d styblinskitang4d schwefel10d styblinskitang10d; do
  for H in 0 1 2 3; do NM $FN $H 30 1800; done
done
echo "$(date +%H:%M:%S) QUEUE-R5-FINAL-DONE" >> $LOGDIR/R5_QUEUE_STATUS

#!/bin/bash
# Round-5 phase-2 chip queue (replaces the tail of parity_queue_r5_final
# once the gramacylee/ackley2d ladders + GHQ are done). Tight priority:
# one cell per distinct VERDICT item first, widen afterwards.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

BK () { # fn horizon trials timeout — data-for-various-horizons-backup protocol
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 50 --sgd-iterations 50 \
    --optimize --dtype float32 --initial-observations 1 \
    --checkpoint-every 5 --output-dir results/nonmyopic_backup \
    > "$LOGDIR/r5_backup_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) backup $FN h=$H rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
}

TRUNC () { # schedule outdir
  local SCHED=$1 OUT=$2
  timeout 1500 $PY -m rollout_bo_tpu.experiments.adaptive \
    --function-name braninhoo --horizon 1 --trials 30 --budget 20 \
    --batch-size 8 --starts 8 --mc-samples 100 --sgd-iterations 50 \
    --variance-reduction --log10-parity --optimize --dtype float32 \
    --n-init 1 --schedule $SCHED --resume --output-dir $OUT \
    > $LOGDIR/r5_${SCHED}_braninhoo.log 2>&1
  echo "$(date +%H:%M:%S) $SCHED braninhoo rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
}

# loose-acceptance h3 retry with the f32-mask freeze carry (the i1
# carry failed Mosaic legalization on the first attempt)
timeout 1200 $PY -m rollout_bo_tpu.experiments.nonmyopic \
  --function-name gramacylee --horizon 3 --trials 30 --budget 15 \
  --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
  --variance-reduction --log10-parity --solve-f-tol 1e-3 --optimize \
  --dtype float32 --initial-observations 1 --checkpoint-every 5 \
  --output-dir results/probe_loose \
  > $LOGDIR/r5_loose_gramacylee_h3_retry.log 2>&1
echo "$(date +%H:%M:%S) loose gramacylee h3 retry rc=$?" >> $LOGDIR/R5_QUEUE_STATUS

BK braninhoo 1 20 1200
TRUNC truncated results/truncated
TRUNC fixed results/no_truncated

timeout 900 $PY -m rollout_bo_tpu.experiments.cost_aware \
  --function-name braninhoo --trials 10 --budget 15 --horizon 1 \
  --mc-samples 100 --starts 8 --batch-size 8 --sgd-iterations 50 \
  --optimize --variance-reduction --log10-parity --checkpoint-every 5 \
  --output-dir results/cost_aware > $LOGDIR/r5_cost_aware.log 2>&1
echo "$(date +%H:%M:%S) cost_aware rc=$?" >> $LOGDIR/R5_QUEUE_STATUS

timeout 900 $PY scripts/probe_f64_pallas.py > $LOGDIR/r5_f64_probe.log 2>&1
echo "$(date +%H:%M:%S) f64 probe rc=$?" >> $LOGDIR/R5_QUEUE_STATUS
timeout 1200 $PY scripts/ab_pallas_loose.py > $LOGDIR/r5_ab_loose.log 2>&1
echo "$(date +%H:%M:%S) ab loose rc=$?" >> $LOGDIR/R5_QUEUE_STATUS

BK braninhoo 2 20 1200
BK braninhoo 3 20 1200
for H in 1 2 3; do BK hartmann3d $H 20 1200; done
for FN in goldsteinprice rosenbrock rastrigin4d mccormick; do
  for H in 1 2 3; do BK $FN $H 20 1200; done
done
echo "$(date +%H:%M:%S) PHASE2-BACKUP-DONE" >> $LOGDIR/R5_QUEUE_STATUS

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
for FN in trid10d styblinskitang4d schwefel10d styblinskitang10d; do
  for H in 0 1 2 3; do NM $FN $H 30 1800; done
done
echo "$(date +%H:%M:%S) PHASE2-DONE" >> $LOGDIR/R5_QUEUE_STATUS

#!/bin/bash
# Round-5 chip queue B/C (after r5a): h0 small-d cells to 60 trials
# (basin-tie variance needs n; the engines agree on 21/30 trials and the
# flips are chaotic-divergence coin flips), Mosaic-f64 probe, loose-lane
# on-TPU A/B, the cost-aware artifact, the wide backup horizon ladder,
# and the truncated-horizon braninhoo runs.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

NM () { # fn horizon trials timeout
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --log10-parity --optimize --dtype float32 \
    --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic \
    > "$LOGDIR/r5_nonmyopic_${FN}_h$H.x60.log" 2>&1
  echo "$(date +%H:%M:%S) $FN h=$H x60 rc=$?"
}
# requeue the six ladder cells lost to the transient custom_vmap
# signature break (trid10d/styblinskitang4d h1-3 crashed on start;
# their CSVs are empty, so resume reruns all 30 trials)
for H in 1 2 3; do NM trid10d          $H 30 1800; done
for H in 1 2 3; do NM styblinskitang4d $H 30 2400; done

NM gramacylee 0 60 1800
NM gramacylee 3 60 2400
NM ackley2d   0 60 1800
# gramacylee h3 with the reference's loose INNER acceptance on the
# rollout EI solves (rbf_optim.jl:26-30 applies f_tol=x_tol=1e-3 to
# every inner solve; ours are tight by default) — exercises the round-5
# loose Pallas lanes on the chip
timeout 2400 $PY -m rollout_bo_tpu.experiments.nonmyopic \
  --function-name gramacylee --horizon 3 --trials 30 --budget 15 \
  --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
  --variance-reduction --log10-parity --solve-f-tol 1e-3 --optimize \
  --dtype float32 --initial-observations 1 --checkpoint-every 5 \
  --output-dir results/probe_loose \
  > $LOGDIR/r5_loose_gramacylee_h3.log 2>&1
echo "$(date +%H:%M:%S) loose gramacylee h3 rc=$?"
touch $LOGDIR/R5B_TIMING_DONE

# Mosaic f64 probe + loose-lane on-TPU A/B
timeout 2400 $PY scripts/probe_f64_pallas.py > $LOGDIR/r5_f64_probe.log 2>&1
echo "$(date +%H:%M:%S) f64 probe rc=$?"
timeout 3600 $PY scripts/ab_pallas_loose.py > $LOGDIR/r5_ab_loose.log 2>&1
echo "$(date +%H:%M:%S) ab loose rc=$?"

# cost-aware artifact on the chip (3 modes, braninhoo h=1)
timeout 5400 $PY -m rollout_bo_tpu.experiments.cost_aware \
  --function-name braninhoo --trials 15 --budget 15 --horizon 1 \
  --mc-samples 100 --starts 8 --batch-size 8 --sgd-iterations 50 \
  --optimize --variance-reduction --log10-parity --checkpoint-every 5 \
  --output-dir results/cost_aware > $LOGDIR/r5_cost_aware.log 2>&1
echo "$(date +%H:%M:%S) cost_aware rc=$?"

# wide horizon ladder vs data-for-various-horizons-backup
# (its protocol: 50 MC, NO variance reduction, 1 initial obs, budget 15)
BK () { # fn horizon trials timeout
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 50 --sgd-iterations 50 \
    --optimize --dtype float32 --initial-observations 1 \
    --checkpoint-every 5 --output-dir results/nonmyopic_backup \
    > "$LOGDIR/r5_backup_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) backup $FN h=$H rc=$?"
}
for FN in braninhoo goldsteinprice hartmann3d rosenbrock rastrigin4d mccormick; do
  for H in 1 2 3; do BK $FN $H 20 2400; done
done

# truncated / no-truncated schedules (braninhoo h=1, budget 20, 100 MC)
for SCHED in truncated fixed; do
  OUT=results/truncated; [ "$SCHED" = fixed ] && OUT=results/no_truncated
  timeout 3600 $PY -m rollout_bo_tpu.experiments.adaptive \
    --function-name braninhoo --horizon 1 --trials 30 --budget 20 \
    --batch-size 8 --starts 8 --mc-samples 100 --sgd-iterations 50 \
    --variance-reduction --log10-parity --optimize --dtype float32 \
    --n-init 1 --schedule $SCHED --resume --output-dir $OUT \
    > $LOGDIR/r5_${SCHED}_braninhoo.log 2>&1
  echo "$(date +%H:%M:%S) $SCHED braninhoo rc=$?"
done
echo QUEUE-R5BC-DONE

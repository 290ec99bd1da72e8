#!/bin/bash
# Round-5 chip queue A (timing-clean: keep the host CPU free while this
# runs). 1) Rerun all six BASELINE §6.2 ladders FRESH at 30 trials with
# --log10-parity (the round-5 root cause of the gramacylee/ackley2d
# deficit: the reference's archived QMC runs fantasize with the log10
# Box-Muller quirk's std-0.659 draws). Old flag-off data archived to
# results/nonmyopic_noflag for the measured comparison. 2) GHQ ladders
# (node-scaled under the same flag) for gramacylee h0-3 + ackley2d h0-2
# at 30 trials (h3 at 15 — 4096-point quadrature). 3) h=4 and myopic
# lcb/random extensions to 30 trials (resume counts CSV rows).
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
  echo "$(date +%H:%M:%S) $FN h=$H rc=$?"
}

for H in 0 1 2 3; do NM gramacylee        $H 30 2400; done
for H in 0 1 2 3; do NM ackley2d          $H 30 2400; done
for H in 0 1 2 3; do NM trid10d           $H 30 1800; done
for H in 0 1 2 3; do NM styblinskitang4d  $H 30 2400; done
for H in 0 1 2 3; do NM schwefel10d       $H 30 1800; done
for H in 0 1 2 3; do NM styblinskitang10d $H 30 1800; done
echo LADDERS-DONE

GHQ () { # fn horizon trials timeout
  local FN=$1 H=$2 T=$3 TO=$4
  timeout "$TO" $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name "$FN" --horizon "$H" --trials "$T" --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --deterministic-solve --ghq-nodes 8 --log10-parity --optimize \
    --dtype float32 --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/nonmyopic_ghq \
    > "$LOGDIR/r5_ghq_${FN}_h$H.log" 2>&1
  echo "$(date +%H:%M:%S) ghq $FN h=$H rc=$?"
}

for H in 0 1 2; do GHQ gramacylee $H 30 2400; done
GHQ gramacylee 3 15 5400
for H in 0 1 2; do GHQ ackley2d $H 30 2400; done
echo GHQ-DONE

# h=4 extensions to 30 trials (backup protocol: 50 MC, NO variance
# reduction -> randn streams, the quirk does not apply; resume appends)
for FN in gramacylee ackley4d; do
  timeout 3000 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name $FN --horizon 4 --trials 30 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 50 --sgd-iterations 50 \
    --optimize --dtype float32 --initial-observations 1 \
    --checkpoint-every 5 --output-dir results/nonmyopic_h4 \
    > $LOGDIR/r5_h4_${FN}.log 2>&1
  echo "$(date +%H:%M:%S) h4 $FN rc=$?"
done

# myopic thin cells -> 30 trials (f32 chip; POI runs separately in f64)
for FN in goldsteinprice griewank3d ackley5d levy10d hartmann6d; do
  timeout 3000 $PY -m rollout_bo_tpu.experiments.myopic \
    --function-name $FN --trials 30 --budget 100 --starts 64 \
    --acquisitions lcb random --dtype float32 --checkpoint-every 50 \
    --output-dir results/myopic > $LOGDIR/r5_myopic_${FN}_lr30.log 2>&1
  echo "$(date +%H:%M:%S) myopic $FN lcb/random-30 rc=$?"
done
echo QUEUE-R5A-DONE

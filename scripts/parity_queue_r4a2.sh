#!/bin/bash
# Round-4 queue A2: regenerate the styblinskitang ladders with the fixed
# exploration fallback (the crawl-engine rows are replaced — both
# functions sit far below the zero prior mean, the exact regime the
# round-4 fallback fix changes). Serial against the single TPU chip.
set -u
cd /root/repo
PY=${PY:-/opt/venv/bin/python}
LOGDIR=results/logs; mkdir -p $LOGDIR

for FN in styblinskitang10d styblinskitang4d; do
  rm -rf results/nonmyopic/$FN
  for H in 0 1 2 3; do
    timeout 2700 $PY -m rollout_bo_tpu.experiments.nonmyopic \
      --function-name $FN --horizon $H --trials 10 --budget 15 \
      --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
      --variance-reduction --optimize --dtype float32 \
      --initial-observations 1 --checkpoint-every 5 \
      --output-dir results/nonmyopic \
      > "$LOGDIR/r4a2_nonmyopic_${FN}_h$H.log" 2>&1
    echo "$(date +%H:%M:%S) $FN h=$H rc=$?"
  done
done
echo QUEUE-A2-DONE

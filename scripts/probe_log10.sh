#!/bin/bash
# Round-5 probe: does reproducing the reference's Box-Muller log10 quirk
# (fantasy-draw std 0.659 instead of 1) close the gramacylee regret
# deficit? CPU run; compared against results/nonmyopic (flag off, 30
# trials) and the reference archive.
set -u
cd /root/repo
PY=/opt/venv/bin/python
export ROLLOUT_BO_TPU_PLATFORM=cpu
for H in 0 1; do
  timeout 3600 $PY -m rollout_bo_tpu.experiments.nonmyopic \
    --function-name gramacylee --horizon $H --trials 15 --budget 15 \
    --batch-size 8 --starts 8 --mc-samples 200 --sgd-iterations 50 \
    --variance-reduction --log10-parity --optimize --dtype float32 \
    --initial-observations 1 --checkpoint-every 5 \
    --output-dir results/probe_log10 \
    > results/logs/r5_probe_log10_h$H.log 2>&1
  echo "$(date +%H:%M:%S) probe h=$H rc=$?"
done
echo PROBE-DONE

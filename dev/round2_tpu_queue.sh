#!/bin/bash
# Round-2 TPU work queue — run solo (one process at a time on the tunnel).
# Usage: bash dev/round2_tpu_queue.sh >> /tmp/tpu_queue.log 2>&1
set -x
cd /root/repo

# 1. lambda_tv sweep on the noisy flagship (semiconvergence study, VERDICT #4)
for ltv in 0.05 0.15 0.30; do
  timeout 2400 python dev/quality_tv_sweep.py $ltv || echo "SWEEP $ltv FAILED"
done

# 2. chest stand-in case: train 30k with default hyperparameters (VERDICT #5)
timeout 3000 python -u train.py \
  --source_path data/chest_synth/chest_cone_50 \
  --model_path output/chest_cone_50 \
  --test_iterations 1 5000 10000 20000 30000 \
  --save_iterations 30000 || echo "CHEST TRAIN FAILED"
timeout 1200 python test.py --model_path output/chest_cone_50 \
  || echo "CHEST TEST FAILED"

# 3. headline bench
timeout 900 python bench.py || echo "BENCH FAILED"
echo "QUEUE DONE"

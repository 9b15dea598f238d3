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

# 4. views protocol on the blurred shepp-logan flagship (reference 25/50/75)
for nv in 50 75; do
  timeout 3000 python -u train.py \
    --source_path data/slb_cone_$nv --model_path output/slb_cone_$nv \
    --test_iterations 1 5000 10000 20000 30000 --save_iterations 30000 \
    || echo "SLB$nv TRAIN FAILED"
  timeout 1200 python test.py --model_path output/slb_cone_$nv --skip_render_train \
    || echo "SLB$nv TEST FAILED"
done
echo "QUEUE DONE (incl. views protocol)"

# 5. batched-step kernel A/B at the 500k state (pick winner, then decide
#    whether to flip the SPLAT_BATCH default)
for b in 0 2 4 8; do
  R2G_SPLAT_BATCH=$b timeout 900 python dev/batch_ab.py state_1100.npz \
    || echo "BATCH_AB $b FAILED"
done
echo "QUEUE DONE (incl. batch A/B)"

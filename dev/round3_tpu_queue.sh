#!/bin/bash
# Round-3 TPU evidence queue — run solo (one process at a time on the tunnel).
# Ordered by VERDICT priority: a guaranteed bench number first, then the
# quality-remedy sweep, then the chest-case + views-protocol quality runs.
# Usage: bash dev/round3_tpu_queue.sh >> /tmp/tpu_queue_r3.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data output

# 1. headline bench FIRST — guarantees a driver-verifiable number exists
timeout 1800 python bench.py | tee .bench_data/bench_r3_early.json \
  || echo "BENCH FAILED"

# 2. TPU kernel regression tests (validates the kernels on real HW)
timeout 1800 python -m pytest tests_tpu/ -x -q || echo "TPU TESTS FAILED"

# 3. lambda_tv sweep on the noisy flagship (30k-quality remedy, VERDICT #3),
#    plus one late-LR-floor variant (the other principled semiconvergence
#    remedy: smaller terminal step sizes stop the noise-fitting drift)
for ltv in 0.05 0.15 0.30; do
  timeout 2400 python dev/quality_tv_sweep.py $ltv || echo "SWEEP $ltv FAILED"
done
timeout 2400 python dev/quality_tv_sweep.py 0.05 lrfloor \
  position_lr_final=5e-6 density_lr_final=2e-4 scaling_lr_final=1e-4 \
  rotation_lr_final=2e-5 || echo "SWEEP lrfloor FAILED"

# 3. chest stand-in case: train 30k with default hyperparameters (VERDICT #1)
timeout 3600 python -u train.py \
  --source_path data/chest_synth/chest_cone_50 \
  --model_path output/chest_cone_50 \
  --test_iterations 1 5000 10000 15000 20000 25000 30000 \
  --save_iterations 30000 || echo "CHEST TRAIN FAILED"
timeout 1200 python test.py --model_path output/chest_cone_50 \
  || echo "CHEST TEST FAILED"

# 4. views protocol on the blurred shepp-logan flagship (reference 25/50/75)
for nv in 50 75; do
  timeout 3600 python -u train.py \
    --source_path data/slb_cone_$nv --model_path output/slb_cone_$nv \
    --test_iterations 1 5000 10000 15000 20000 25000 30000 \
    --save_iterations 30000 \
    || echo "SLB$nv TRAIN FAILED"
  timeout 1200 python test.py --model_path output/slb_cone_$nv --skip_render_train \
    || echo "SLB$nv TEST FAILED"
done

# 5. batched-step kernel A/B at the 500k state (decide R2G_SPLAT_BATCH default)
for b in 0 2 4 8; do
  R2G_SPLAT_BATCH=$b timeout 900 python dev/batch_ab.py state_1100.npz \
    || echo "BATCH_AB $b FAILED"
done

# 6. speed-of-light accounting at the 500k state (VERDICT #5 written bound)
timeout 1800 python dev/mfu_bound.py state_1100.npz \
  | tee .bench_data/mfu_bound.json || echo "MFU_BOUND FAILED"

# 7. render the collected quality artifacts as markdown tables
python dev/collect_results.py || true

echo "ROUND3 QUEUE DONE"

#!/bin/bash
# Round-3 TPU evidence queue — run solo (one process at a time on the tunnel).
# Ordered by evidence-per-hour under an unreliable tunnel: a guaranteed bench
# number first, then the headline quality runs (chest 30k, 50/75-view
# protocol — the VERDICT #1 "Done =" tables), then the TV-sweep remedy study,
# then kernel validation + A/Bs. Every step is idempotent (skip-if-done), so
# a tunnel death mid-queue costs only the step in flight: rerun this script.
# Usage: bash dev/round3_tpu_queue.sh >> /tmp/tpu_queue_r3.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data output

# 0. datasets (data/ is gitignored and a re-image wipes it — rebuild first)
bash dev/stage_datasets.sh || echo "STAGING FAILED"

# 1. headline bench FIRST — guarantees a driver-verifiable number exists
if ! grep -q '"vs_baseline": [0-9]' .bench_data/bench_r3_early.json 2>/dev/null; then
  timeout 1800 python bench.py | tee .bench_data/bench_r3_early.json \
    || echo "BENCH FAILED"
fi

# 2. chest stand-in case, 30k, default hyperparameters (VERDICT #1 north star)
if [ ! -f output/chest_cone_50/point_cloud/iteration_30000/point_cloud.pickle ]; then
  flock -w 7200 .bench_data/tpu.lock timeout 3600 python -u train.py \
    --source_path data/chest_synth/chest_cone_50 \
    --model_path output/chest_cone_50 --debug \
    --test_iterations 1 5000 7500 10000 15000 20000 25000 30000 \
    --save_iterations 30000 || echo "CHEST TRAIN FAILED"
fi
if [ ! -f output/chest_cone_50/test/iter_030000/eval3d.yml ]; then
  flock -w 7200 .bench_data/tpu.lock timeout 1200 python test.py --model_path output/chest_cone_50 \
    || echo "CHEST TEST FAILED"
fi

# 3. views protocol on the blurred shepp-logan flagship (reference 25/50/75)
for nv in 50 75; do
  if [ ! -f output/slb_cone_$nv/point_cloud/iteration_30000/point_cloud.pickle ]; then
    flock -w 7200 .bench_data/tpu.lock timeout 3600 python -u train.py \
      --source_path data/slb_cone_$nv --model_path output/slb_cone_$nv \
      --test_iterations 1 5000 10000 15000 20000 25000 30000 \
      --save_iterations 30000 \
      || echo "SLB$nv TRAIN FAILED"
  fi
  if [ ! -f output/slb_cone_$nv/test/iter_030000/eval3d.yml ]; then
    flock -w 7200 .bench_data/tpu.lock timeout 1200 python test.py --model_path output/slb_cone_$nv --skip_render_train \
      || echo "SLB$nv TEST FAILED"
  fi
done

# 4. lambda_tv sweep on the noisy flagship (30k-quality remedy, VERDICT #3),
#    plus one late-LR-floor variant (the other principled semiconvergence
#    remedy: smaller terminal step sizes stop the noise-fitting drift)
for ltv in 0.05 0.15 0.3; do
  if ! grep -q "\"tag\": \"ltv$ltv\".*\"iter\": 30000" .bench_data/tv_sweep.jsonl 2>/dev/null; then
    flock -w 7200 .bench_data/tpu.lock timeout 2400 python dev/quality_tv_sweep.py $ltv || echo "SWEEP $ltv FAILED"
  fi
done
if ! grep -q '"tag": "lrfloor".*"iter": 30000' .bench_data/tv_sweep.jsonl 2>/dev/null; then
  flock -w 7200 .bench_data/tpu.lock timeout 2400 python dev/quality_tv_sweep.py 0.05 lrfloor \
    position_lr_final=5e-6 density_lr_final=2e-4 scaling_lr_final=1e-4 \
    rotation_lr_final=2e-5 || echo "SWEEP lrfloor FAILED"
fi
# Polyak-averaged evaluation params (the third principled semiconvergence
# remedy: iterate averaging — noise fitting is high-frequency in iteration
# index and averages out)
if ! grep -q '"tag": "ema".*"iter": 30000' .bench_data/tv_sweep.jsonl 2>/dev/null; then
  flock -w 7200 .bench_data/tpu.lock timeout 2400 python dev/quality_tv_sweep.py 0.05 ema ema_decay=0.999 \
    || echo "SWEEP ema FAILED"
fi
# Fast-decay schedule + low floors: reach terminal (tiny) LRs by 10k so the
# model freezes near its peak instead of drifting into the noise for 20k
# more iterations. EMA alone follows the drift (its 1k-iter window is short
# vs the drift timescale); lrfloor alone only bites after ~20k. This is the
# combined remedy the round-2 semiconvergence study points at.
if ! grep -q '"tag": "lrfast".*"iter": 30000' .bench_data/tv_sweep.jsonl 2>/dev/null; then
  flock -w 7200 .bench_data/tpu.lock timeout 2400 python dev/quality_tv_sweep.py 0.05 lrfast \
    position_lr_final=5e-6 density_lr_final=2e-4 scaling_lr_final=1e-4 \
    rotation_lr_final=2e-5 position_lr_max_steps=10000 \
    density_lr_max_steps=10000 scaling_lr_max_steps=10000 \
    rotation_lr_max_steps=10000 ema_decay=0.999 || echo "SWEEP lrfast FAILED"
fi

# 5. the 500k stress state the A/Bs and the census run at (re-image wipes it)
if [ ! -f .bench_data/state_1100.npz ]; then
  flock -w 7200 .bench_data/tpu.lock timeout 2400 python dev/make_stress_state.py 1100 \
    || echo "STRESS STATE FAILED"
fi

# 6. batched-step kernel A/B at the 500k state (decide R2G_SPLAT_BATCH default)
if [ ! -f .bench_data/batch_ab_r3.log ]; then
  for b in 0 2 4 8; do
    R2G_SPLAT_BATCH=$b flock -w 7200 .bench_data/tpu.lock timeout 900 python dev/batch_ab.py state_1100.npz \
      || echo "BATCH_AB $b FAILED"
  done 2>&1 | tee .bench_data/batch_ab_r3.log
fi

# 6b. selector-dot precision A/B at the 500k state (R2G_SELDOT lever:
#     the ~7.5e10 f32-HIGHEST selector flops; split2 is quality-safe,
#     bf16 needs the quality gate before any default flip)
if [ ! -f .bench_data/seldot_ab_r3.log ]; then
  for m in highest split2 bf16; do
    R2G_SELDOT=$m flock -w 7200 .bench_data/tpu.lock timeout 900 python dev/batch_ab.py state_1100.npz \
      || echo "SELDOT_AB $m FAILED"
  done 2>&1 | tee .bench_data/seldot_ab_r3.log
fi

# 7. speed-of-light accounting at the 500k state (VERDICT #5 written bound)
if ! grep -q '"rates"' .bench_data/mfu_bound.json 2>/dev/null; then
  flock -w 7200 .bench_data/tpu.lock timeout 1800 python dev/mfu_bound.py state_1100.npz \
    | tee .bench_data/mfu_bound.json || echo "MFU_BOUND FAILED"
fi

# 8. TPU kernel regression tests (validates the kernels on real HW) — after
#    the A/B + bound evidence so a tight round still lands VERDICT #5 first
flock -w 7200 .bench_data/tpu.lock timeout 1800 python -m pytest tests_tpu/ -x -q || echo "TPU TESTS FAILED"

# 9. render the collected quality artifacts as markdown tables
python dev/collect_results.py || true

echo "ROUND3 QUEUE DONE"

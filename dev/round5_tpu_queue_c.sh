#!/bin/bash
# Round-5 TPU evidence queue, phase C (after phase B; recovers its two
# failures and validates the shipped split2 default):
#   1. bench.py with the split2 default — the round-5 headline number
#   2. TPU-gated test suite rerun (mode-aware eval-path tolerance)
#   3. head_cone_75 reference-default control cell (phase B hit the 1h
#      timeout at 25k/30k: in-train evals at 7 iters + lock stalls; rerun
#      with a 2h budget and the same highest/GROUP=2 control pinning)
#   4. real-data protocol run at production scale (phase B's pseudo-GT FDK
#      took down the TPU worker in the single 240-view dispatch; the ingest
#      now chunks the backprojection, ops/fdk.py view_chunk)
# Idempotent. Usage: bash dev/round5_tpu_queue_c.sh >> /tmp/tpu_queue_r5c.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data output data
LOCK="flock -w 10800 .bench_data/tpu.lock"

# 1. headline bench (watchdog prints one JSON line regardless)
BENCH_BUDGET_S=1100 timeout 1200 python bench.py | tee .bench_data/bench_r5_split2.json

# 2. TPU-gated regressions
if [ ! -f .bench_data/tpu_tests_r5.ok ]; then
  $LOCK timeout 5400 python -m pytest tests_tpu/ -q \
    && touch .bench_data/tpu_tests_r5.ok || echo "TPU TESTS FAILED"
fi

train_case () {  # src_dir out_dir extra...
  local src=$1 out=$2; shift 2
  if [ ! -f output/$out/point_cloud/iteration_30000/point_cloud.pickle ]; then
    $LOCK timeout 7200 python -u train.py --source_path $src \
      --model_path output/$out "$@" \
      --test_iterations 1 5000 10000 15000 20000 25000 30000 \
      --save_iterations 30000 || echo "TRAIN FAILED: $out"
  fi
  if [ ! -f output/$out/test/iter_030000/eval3d.yml ]; then
    $LOCK timeout 1800 python test.py --model_path output/$out \
      --skip_render_train || echo "TEST FAILED: $out"
  fi
}

# 3. the last missing default-schedule control cell (pinned like the others)
export R2G_SELDOT=highest R2G_GROUP=2
train_case data/head_cone_75 head_cone_75

# 4. real-data protocol at production scale (ship config = split2 default)
unset R2G_SELDOT R2G_GROUP
if [ ! -f data/real_fips/meta_data.json ]; then
  $LOCK timeout 3600 python data_generator/generate_real.py \
    --data data/raw_fips --output data/real_fips \
    --n_train 50 --n_test 100 --proj_subsample 2 \
    || echo "REAL INGEST FAILED"
fi
if [ ! -f data/real_fips/init_real_fips.npy ]; then
  $LOCK timeout 1200 python initialize_pcd.py --data data/real_fips \
    || echo "REAL INIT FAILED"
fi
train_case data/real_fips real_fips_50_lrfast --config configs/lrfast.yml

echo "ROUND5 QUEUE C DONE"

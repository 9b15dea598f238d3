#!/bin/bash
# Round-4 TPU evidence queue — run solo (one process at a time on the tunnel).
# Produces the full quality-protocol matrix (VERDICT r3 items 4+5): 3 cases
# x {25,50,75} views with the lrfast preset, one parallel-beam end-to-end
# run, and the flagship default-vs-preset comparison rows (the round-3
# default runs in output/{chest_cone_50,slb_cone_50,slb_cone_75} are kept as
# the "default" arm). Idempotent: rerun on tunnel death.
# Usage: bash dev/round4_tpu_queue.sh >> /tmp/tpu_queue_r4.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data output
LOCK="flock -w 10800 .bench_data/tpu.lock"

bash dev/stage_round4.sh || echo "STAGING FAILED"

train_case () {  # src_dir out_dir extra...
  local src=$1 out=$2; shift 2
  if [ ! -f output/$out/point_cloud/iteration_30000/point_cloud.pickle ]; then
    $LOCK timeout 3600 python -u train.py --source_path $src \
      --model_path output/$out "$@" \
      --test_iterations 1 5000 10000 15000 20000 25000 30000 \
      --save_iterations 30000 || echo "TRAIN FAILED: $out"
  fi
  if [ ! -f output/$out/test/iter_030000/eval3d.yml ]; then
    $LOCK timeout 1800 python test.py --model_path output/$out \
      --skip_render_train || echo "TEST FAILED: $out"
  fi
}

# 1. the 3x3 matrix with the lrfast preset (the headline table)
for nv in 25 50 75; do
  train_case data/slb_cone_$nv slb_cone_${nv}_lrfast --config configs/lrfast.yml
done
for nv in 25 50 75; do
  src=data/chest_cone_$nv
  [ $nv = 50 ] && src=data/chest_synth/chest_cone_50
  train_case $src chest_cone_${nv}_lrfast --config configs/lrfast.yml
done
for nv in 25 50 75; do
  train_case data/head_cone_$nv head_cone_${nv}_lrfast --config configs/lrfast.yml
done

# 2. parallel-beam end-to-end training run (VERDICT r3 weak #6)
train_case data/slb_parallel_50 slb_parallel_50_lrfast --config configs/lrfast.yml

# 3. default-arm rows the round-3 artifacts don't already cover (head +
#    25-view cases at reference defaults, for the preset-vs-default table)
train_case data/slb_cone_25 slb_cone_25
train_case data/head_cone_50 head_cone_50

# 4. TPU-gated kernel/eval regressions at realistic shapes
if [ ! -f .bench_data/tpu_tests_r4.ok ]; then
  $LOCK timeout 3600 python -m pytest tests_tpu/ -q \
    && touch .bench_data/tpu_tests_r4.ok || echo "TPU TESTS FAILED"
fi

# 5. refresh the steady-state snapshot + warm bench caches for the driver
if [ ! -f .bench_data/state_slb_1100.npz ]; then
  $LOCK timeout 1800 python dev/snapshot_state.py 1100 || echo "SNAP FAILED"
fi
if ! python -c "import json; d=json.load(open('.bench_data/bench_r4_queue.json')); exit(0 if d.get('value') else 1)" 2>/dev/null; then
  timeout 1800 python bench.py | tee .bench_data/bench_r4_queue.json \
    || echo "BENCH FAILED"
fi

echo "ROUND4 QUEUE DONE"

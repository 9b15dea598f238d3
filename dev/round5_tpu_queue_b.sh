#!/bin/bash
# Round-5 TPU evidence queue, phase B (run after phase A):
#   1. the 4 missing reference-default quality-matrix control cells
#      (chest 25/75, head 25/75) — pinned to R2G_SELDOT=highest so they are
#      directly comparable with the round-3/4 control rows
#   2. the seldot quality gate: the slb 25-view lrfast cell re-trained with
#      R2G_SELDOT=split2 (ship config); pass = PSNR3D within 0.05 dB of the
#      existing `highest` run (output/slb_cone_25_lrfast: 38.95)
#   3. production-scale real-data protocol run (VERDICT item 6):
#      synthesized FIPS-style raw (1024^2 x 240 views) -> generate_real.py
#      -> initialize_pcd -> 30k train -> test, all at 512^2/256^3 scale
#   4. TPU-gated test suite (incl. the new row-bucket hardware guard)
# Idempotent. Usage: bash dev/round5_tpu_queue_b.sh >> /tmp/tpu_queue_r5b.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data output data
LOCK="flock -w 10800 .bench_data/tpu.lock"

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

# 1. missing default-schedule control cells (comparable: highest, GROUP=2)
export R2G_SELDOT=highest R2G_GROUP=2
train_case data/chest_cone_25 chest_cone_25
train_case data/chest_cone_75 chest_cone_75
train_case data/head_cone_25 head_cone_25
train_case data/head_cone_75 head_cone_75

# 2. seldot quality gate (ship config)
export R2G_SELDOT=split2 R2G_GROUP=2
train_case data/slb_cone_25 slb_cone_25_lrfast_split2 --config configs/lrfast.yml

# 3. real-data protocol run at production scale (ship config)
if [ ! -f data/raw_fips/config.txt ]; then
  $LOCK timeout 3600 python dev/make_fips_raw.py || echo "RAW SYNTH FAILED"
fi
if [ ! -f data/real_fips/meta_data.json ]; then
  $LOCK timeout 2400 python data_generator/generate_real.py \
    --data data/raw_fips --output data/real_fips \
    --n_train 50 --n_test 100 --proj_subsample 2 \
    || echo "REAL INGEST FAILED"
fi
if [ ! -f data/real_fips/init_real_fips.npy ]; then
  $LOCK timeout 1200 python initialize_pcd.py --data data/real_fips \
    || echo "REAL INIT FAILED"
fi
train_case data/real_fips real_fips_50_lrfast --config configs/lrfast.yml

# 4. TPU-gated regressions (covers both seldot modes + the row-bucket guard)
unset R2G_SELDOT R2G_GROUP
if [ ! -f .bench_data/tpu_tests_r5.ok ]; then
  $LOCK timeout 5400 python -m pytest tests_tpu/ -q \
    && touch .bench_data/tpu_tests_r5.ok || echo "TPU TESTS FAILED"
fi

echo "ROUND5 QUEUE B DONE"

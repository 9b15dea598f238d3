#!/bin/bash
# Stage the round-4 quality-matrix datasets (idempotent). Extends
# dev/stage_datasets.sh: the matrix is 3 cases x {25,50,75} views plus one
# parallel-beam end-to-end case. Every JAX step serializes on the TPU
# advisory lock so it never contends with bench.py or other queue entries.
set -x
cd /root/repo
mkdir -p data .bench_data
LOCK="flock -w 14400 .bench_data/tpu.lock"

# 0. head phantom volume (CPU-only)
if [ ! -f data/volumes/head.npy ]; then
  python data_generator/head_phantom.py --output data/raw/head.raw \
    --shape 288 288 320 --seed 0 || echo "STEP FAILED"
  python data_generator/process_raw_data.py --input data/raw/head.raw \
    --raw_shape 288 288 320 --output data/volumes/head.npy || echo "STEP FAILED"
fi

stage_case () {  # name vol_args... (datagen at 100 test views + FDK init)
  local name=$1; shift
  if [ ! -f data/$name/meta_data.json ]; then
    $LOCK timeout 2400 python data_generator/generate_synthetic.py \
      "$@" --output data/$name --n_test 100 || echo "STEP FAILED: $name"
  fi
  if [ ! -f data/$name/init_$name.npy ]; then
    $LOCK timeout 1200 python initialize_pcd.py --data data/$name \
      || echo "INIT FAILED: $name"
  fi
}

CONE=data_generator/scanner/cone_beam.yml
PARA=data_generator/scanner/parallel_beam.yml

for nv in 25 75; do
  stage_case chest_cone_$nv --vol data/volumes/chest.npy --scanner $CONE \
    --n_train $nv
done
stage_case slb_cone_25 --phantom shepp_logan --vol_size 256 --blur 1.0 \
  --scanner $CONE --n_train 25
for nv in 25 50 75; do
  stage_case head_cone_$nv --vol data/volumes/head.npy --scanner $CONE \
    --n_train $nv
done
# parallel-beam e2e case (VERDICT weak #6: parallel mode unit-tested only)
stage_case slb_parallel_50 --phantom shepp_logan --vol_size 256 --blur 1.0 \
  --scanner $PARA --n_train 50

echo "ROUND4 STAGING DONE"

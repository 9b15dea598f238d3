#!/bin/bash
# Stage the round-3 evidence datasets (idempotent). The data/ tree is
# gitignored, so a machine re-image wipes it — this script rebuilds the
# exact cases the evidence queue trains on:
#   data/chest_synth/chest_cone_50  — procedural chest phantom -> raw-CT
#       ingest -> synthetic cone datagen at 50 views (north-star case)
#   data/slb_cone_{50,75}           — band-limited Shepp-Logan flagship at
#       the reference's 50/75-view protocol points
# plus FDK point-cloud inits for each. Every JAX step serializes on the
# TPU advisory lock so it never contends with bench.py on the tunnel.
set -x
cd /root/repo
mkdir -p data .bench_data
LOCK="flock -w 7200 .bench_data/tpu.lock"

# 1. chest phantom -> HU .raw -> [0,1] 256^3 cube (CPU-only steps)
if [ ! -f data/volumes/chest.npy ]; then
  mkdir -p data/raw data/volumes
  python data_generator/chest_phantom.py --output data/raw/chest.raw \
    --shape 320 320 280 --seed 0 || echo "STEP FAILED"
  python data_generator/process_raw_data.py --input data/raw/chest.raw \
    --raw_shape 320 320 280 --output data/volumes/chest.npy || echo "STEP FAILED"
fi

# 2. chest cone 50-view case (TPU projector)
if [ ! -f data/chest_synth/chest_cone_50/meta_data.json ]; then
  $LOCK timeout 2400 python data_generator/generate_synthetic.py \
    --vol data/volumes/chest.npy \
    --scanner data_generator/scanner/cone_beam.yml \
    --output data/chest_synth/chest_cone_50 --n_train 50 --n_test 100 \
    || echo "STEP FAILED"
fi
if [ ! -f data/chest_synth/chest_cone_50/init_chest_cone_50.npy ]; then
  $LOCK timeout 1200 python initialize_pcd.py \
    --data data/chest_synth/chest_cone_50 || echo "INIT FAILED"
fi

# 3. band-limited Shepp-Logan at 50 and 75 views (flagship protocol)
for nv in 50 75; do
  if [ ! -f data/slb_cone_$nv/meta_data.json ]; then
    $LOCK timeout 2400 python data_generator/generate_synthetic.py \
      --phantom shepp_logan --vol_size 256 --blur 1.0 \
      --scanner data_generator/scanner/cone_beam.yml \
      --output data/slb_cone_$nv --n_train $nv --n_test 100 || echo "STEP FAILED"
  fi
  if [ ! -f data/slb_cone_$nv/init_slb_cone_$nv.npy ]; then
    $LOCK timeout 1200 python initialize_pcd.py --data data/slb_cone_$nv \
      || echo "INIT FAILED"
  fi
done

echo "STAGING DONE"

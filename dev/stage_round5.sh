#!/bin/bash
# Round-5 staging (idempotent): rebuild everything the machine re-image
# wiped from the gitignored data/ + .bench_data/ trees, in dependency order:
#   1. bench case dataset + a CURRENT default-config bench number (the
#      "before" arm of the round-5 seldot flip)
#   2. quality-matrix datasets + FDK inits (stage_datasets + stage_round4)
#   3. steady-state (61k) and 500k stress snapshots for the kernel A/Bs
# Run solo: every TPU step serializes on the advisory lock.
set -x
cd /root/repo
mkdir -p data .bench_data output
LOCK="flock -w 14400 .bench_data/tpu.lock"

# 1. bench dataset + before-flip baseline number
if [ ! -f .bench_data/slb_256_512_25_50000.npz ] || \
   ! python -c "import json; d=json.load(open('.bench_data/bench_r5_before.json')); exit(0 if d.get('value') else 1)" 2>/dev/null; then
  timeout 1800 python bench.py | tee .bench_data/bench_r5_before.json \
    || echo "STEP FAILED: bench before"
fi

# 2. matrix datasets + inits
bash dev/stage_datasets.sh || echo "STEP FAILED: stage_datasets"
bash dev/stage_round4.sh || echo "STEP FAILED: stage_round4"

# 3. kernel-experiment snapshots
if [ ! -f .bench_data/state_slb_1100.npz ]; then
  $LOCK timeout 1800 python dev/snapshot_state.py 1100 \
    || echo "STEP FAILED: snapshot_state"
fi
if [ ! -f .bench_data/state_1100.npz ]; then
  $LOCK timeout 2400 python dev/make_stress_state.py 1100 \
    || echo "STEP FAILED: make_stress_state"
fi

echo "ROUND5 STAGING DONE"

#!/bin/bash
# Round-6 staging (idempotent): rebuild the gitignored .bench_data/ inputs
# the round-6 perf work needs, in dependency order:
#   1. bench case dataset (512^2 cone 25-view band-limited shepp-logan +
#      FDK init) — consumed by bench.py, dev/step_profile, dev/chunk_timeline
#   2. baseline ramp timeline to 10k with state snapshots at 5k/10k — the
#      "before" arm for the footprint-aware blocking A/B
#   3. 500k stress state (bench.py's secondary metric input)
# Run solo: every TPU step serializes on the advisory lock.
set -x
cd /root/repo
mkdir -p .bench_data
LOCK="flock -w 14400 .bench_data/tpu.lock"

if [ ! -f .bench_data/slb_256_512_25_50000.npz ]; then
  $LOCK timeout 1800 python -c "
import bench
bench.load_or_make(512, 25, 256, 50_000)
print('dataset staged')
" || echo "STEP FAILED: bench dataset"
fi

if [ ! -f .bench_data/state_slb_10000.npz ]; then
  $LOCK timeout 2400 python dev/chunk_timeline.py 10000 --snap=5000,10000 \
    2>&1 | tee .bench_data/chunk_timeline_r6_before.log \
    || echo "STEP FAILED: chunk_timeline"
fi

if [ ! -f .bench_data/state_1100.npz ]; then
  $LOCK timeout 2400 python dev/make_stress_state.py 1100 \
    || echo "STEP FAILED: make_stress_state"
fi

echo "ROUND6 STAGING DONE"

#!/bin/bash
# Round-5 TPU evidence queue, phase D (chains after phase C):
#   1. regenerate mfu_bound.json with the hardened diff-timing harness
#      (the 03:34 artifact had floored rates: the m-vs-2m delta collapsed
#      into tunnel dispatch jitter and every VPU/MXU rate came out ~1e21;
#      dev/mfu_bound.py now validates the delta and retries at 4x trips)
#   2. rerun bench.py to validate the stress-state donation fix on real
#      hardware (the 08:36 run skipped the secondary metric: the timed call
#      reused a donated TrainState -> opaque TPU InvalidArgument)
# Waits for phase C's sentinel in its log before touching the TPU.
# Usage: bash dev/round5_tpu_queue_d.sh >> /tmp/tpu_queue_r5d.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data
LOCK="flock -w 10800 .bench_data/tpu.lock"

for i in $(seq 1 720); do
  grep -q "ROUND5 QUEUE C DONE" /tmp/tpu_queue_r5c.log 2>/dev/null && break
  sleep 30
done

# 1. speed-of-light accounting, hardened harness (keep the stale artifact
#    for diff until the new one lands)
$LOCK timeout 2400 python dev/mfu_bound.py state_slb_1100.npz \
  2>.bench_data/mfu_bound_r5.err | tail -1 > .bench_data/mfu_bound_new.json
if grep -q '"rates"' .bench_data/mfu_bound_new.json; then
  mv .bench_data/mfu_bound_new.json .bench_data/mfu_bound.json
else
  echo "MFU BOUND FAILED"
fi

# 2. headline bench with the fixed stress-state secondary metric
BENCH_BUDGET_S=1400 timeout 1500 python bench.py \
  | tee .bench_data/bench_r5_final.json

# 3. kernel-level decomposition at the post-split2 steady state (render
#    fwd / fwd+bwd isolation + tier occupancy + pair accounting) — the
#    current data behind the speed-of-light narrative
$LOCK timeout 1200 python dev/kernel_profile.py state_slb_1100.npz auto \
  > .bench_data/kernel_profile_r5.log 2>&1 || echo "KERNEL PROFILE FAILED"

echo "ROUND5 QUEUE D DONE"

#!/bin/bash
# Round-6 A/B: GROUP x tier-ladder at the late (footprint-spread) 10k
# state — the regime the round-5 timeline showed ramping 8.5 -> 16.9 ms/it.
# Candidates ranked by dev/block_sim.py (evaluated pairs, tight footprints):
#   g2 r5   1949 M (control; reproduces step_profile_10k 17.4 ms)
#   g2 fine 1742 M   g1 r5 1382 M   g1 fine 1236 M
set -x
cd /root/repo
LOCK="flock -w 14400 .bench_data/tpu.lock"
OUT=.bench_data/perf_ab_r6.log
: > $OUT
for cfg in "2 r5" "2 fine" "1 r5" "1 fine"; do
  set -- $cfg
  echo "== 10k_g$1_$2" >> $OUT
  $LOCK env R2G_GROUP=$1 R2G_TIERS=$2 R2G_NROWS=65536 timeout 1200 \
    python dev/step_profile.py state_slb_10000.npz auto >> $OUT 2>&1 \
    || echo "STEP FAILED g$1 $2" >> $OUT
done
echo "PERF AB R6 DONE" >> $OUT

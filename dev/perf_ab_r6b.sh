#!/bin/bash
# Round-6 A/B, trimmed: full-step-only per config (each arm is a fresh
# remote AOT compile; the 4-arm decomposition made each config ~8+ min of
# compile). Control g2_r5 already measured: full 17.5 ms/it
# (.bench_data/perf_ab_r6.log).
set -x
cd /root/repo
LOCK="flock -w 14400 .bench_data/tpu.lock"
OUT=.bench_data/perf_ab_r6.log
for cfg in "1 r5" "2 fine" "1 fine"; do
  set -- $cfg
  echo "== 10k_g$1_$2_full" >> $OUT
  $LOCK env R2G_GROUP=$1 R2G_TIERS=$2 R2G_NROWS=65536 R2G_PROFILE_ONLY=full \
    timeout 1800 python dev/step_profile.py state_slb_10000.npz auto \
    >> $OUT 2>&1 || echo "STEP FAILED g$1 $2" >> $OUT
done
echo "PERF AB R6B DONE" >> $OUT

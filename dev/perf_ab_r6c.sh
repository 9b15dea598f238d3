#!/bin/bash
# Round-6 A/B round 3: the "lane" ladder (window width quantized to the
# 128-lane boundary, height fine; same 8-tier count as r5). Chosen because
# hardware falsified the nominal-pairs model twice:
#   g1_r5: -29% nominal pairs -> 17.6 vs 17.5 ms (wash; per-block
#     overheads double with halved blocks)
#   g2_fine: -11% nominal pairs but 14 tiers -> 23.1 vs 15.9 ms l1-only
#     (tier-count/code-size cost dominates)
# lane_g2 keeps block count AND tier count fixed and cuts LANE-EFFECTIVE
# pairs 21% (2708 -> 2150 M, dev/block_sim.py) — nothing grows.
set -x
cd /root/repo
LOCK="flock -w 14400 .bench_data/tpu.lock"
OUT=.bench_data/perf_ab_r6.log
for cfg in "2 lane" "1 lane"; do
  set -- $cfg
  echo "== 10k_g$1_$2_full" >> $OUT
  $LOCK env R2G_GROUP=$1 R2G_TIERS=$2 R2G_NROWS=65536 R2G_PROFILE_ONLY=full \
    timeout 1800 python dev/step_profile.py state_slb_10000.npz auto \
    >> $OUT 2>&1 || echo "STEP FAILED g$1 $2" >> $OUT
done
echo "PERF AB R6C DONE" >> $OUT

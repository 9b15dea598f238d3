#!/bin/bash
# Round-4 perf A/B wave 2: post-trainer-slicing defaults re-measure, larger
# GROUP sweep (per-block overhead dominates at steady state, so fewer grid
# steps may beat smaller blocks), and split2 selector precision on the best
# group. Same steady state as perf_ab_r4.sh.
set -x
cd /root/repo
LOCK="flock -w 14400 .bench_data/tpu.lock"
OUT=.bench_data/perf_ab_r4b.log
: > $OUT

run () {  # tag env...
  local tag=$1; shift
  echo "== $tag" >> $OUT
  $LOCK env R2G_NROWS=65536 "$@" timeout 1200 python dev/step_profile.py state_slb_1100.npz \
    2>/dev/null | tail -6 >> $OUT
}

# group1 == group2 in wave 1, so the larger-GROUP sweep is a predictable
# wash — dropped to get the trace/probe jobs (the actual decision data)
# onto the chip sooner. Keep one post-trainer-change defaults re-measure.
run defaults_post_slice
echo "PERF AB B DONE" >> $OUT

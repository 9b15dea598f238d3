#!/bin/bash
# Round-5 TPU evidence queue, phase A (run after dev/stage_round5.sh):
#   1. seldot x group perf A/B at BOTH saved states (steady 61k + 500k
#      stress) — the decision data for flipping the R2G_SELDOT default
#   2. re-record the row-slice A/B that perf_ab_r4b.log lost (VERDICT
#      weak #3)
#   3. regenerate the speed-of-light accounting at the post-row-slice
#      steady state (VERDICT item 2) -> .bench_data/mfu_bound.json
# Idempotent; every step serializes on the advisory TPU lock.
# Usage: bash dev/round5_tpu_queue.sh >> /tmp/tpu_queue_r5.log 2>&1
set -x
cd /root/repo
mkdir -p .bench_data
LOCK="flock -w 10800 .bench_data/tpu.lock"

# 1. perf A/B: {highest,split2} x {GROUP 2,1} at both states
AB=.bench_data/perf_ab_r5.log
if ! grep -q "PERF AB R5 DONE" $AB 2>/dev/null; then
  : > $AB
  run () {  # tag state nrows env...
    local tag=$1 state=$2 nrows=$3; shift 3
    echo "== $tag" >> $AB
    $LOCK env R2G_NROWS=$nrows "$@" timeout 1200 \
      python dev/step_profile.py $state 2>/dev/null | tail -6 >> $AB
  }
  for st in "state_slb_1100.npz 65536 steady" "state_1100.npz 0 stress"; do
    set -- $st
    run "${3}_default_g2"      $1 $2
    run "${3}_split2_g2"       $1 $2 R2G_SELDOT=split2
    run "${3}_split2_g1"       $1 $2 R2G_SELDOT=split2 R2G_GROUP=1
    run "${3}_highest_g1"      $1 $2 R2G_GROUP=1
  done
  echo "PERF AB R5 DONE" >> $AB
fi

# 2. row-slice A/B re-record (lost artifact)
RS=.bench_data/rowslice_ab_r5.log
if ! grep -q "ms/it" $RS 2>/dev/null; then
  $LOCK timeout 1200 python dev/rowslice_ab.py state_slb_1100.npz 65536 \
    > $RS 2>&1 || echo "ROWSLICE AB FAILED" >> $RS
fi

# 3. speed-of-light accounting at the steady state
if [ ! -f .bench_data/mfu_bound.json ]; then
  $LOCK timeout 1800 python dev/mfu_bound.py state_slb_1100.npz \
    2>/dev/null | tail -1 > .bench_data/mfu_bound.json \
    || echo "MFU BOUND FAILED"
fi

echo "ROUND5 QUEUE A DONE"

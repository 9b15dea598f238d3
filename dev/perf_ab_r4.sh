#!/bin/bash
# Round-4 perf A/Bs at the bench steady state (state_slb_1100: 61k active,
# 262k capacity). One flock per variant so the evidence queue interleaves.
set -x
cd /root/repo
LOCK="flock -w 7200 .bench_data/tpu.lock"
OUT=.bench_data/perf_ab_r4.log
: > $OUT

run () {  # tag env...
  local tag=$1; shift
  echo "== $tag" >> $OUT
  $LOCK env R2G_NROWS=65536 "$@" timeout 1200 python dev/step_profile.py state_slb_1100.npz \
    2>/dev/null | tail -6 >> $OUT
}

run bwdvmem_g2
run bwddma_g2 R2G_BWD_VMEM=0
run group1 R2G_GROUP=1
run group1_seldot R2G_GROUP=1 R2G_SELDOT=split2
run seldot_split2 R2G_SELDOT=split2
echo "PERF AB DONE" >> $OUT

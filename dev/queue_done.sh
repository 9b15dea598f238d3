#!/bin/bash
# Exit 0 iff every round-3 evidence artifact exists (mirrors the queue's
# skip-if-done guards). Used by tpu_watch.sh to decide when to stop retrying.
cd /root/repo
grep -q '"vs_baseline": [0-9]' .bench_data/bench_r3_early.json 2>/dev/null || exit 1
[ -f output/chest_cone_50/test/iter_030000/eval3d.yml ] || exit 1
[ -f output/slb_cone_50/test/iter_030000/eval3d.yml ] || exit 1
[ -f output/slb_cone_75/test/iter_030000/eval3d.yml ] || exit 1
for tag in ltv0.05 ltv0.15 ltv0.3 lrfloor ema; do
  grep -q "\"tag\": \"$tag\".*\"iter\": 30000" .bench_data/tv_sweep.jsonl 2>/dev/null || exit 1
done
[ -f .bench_data/batch_ab_r3.log ] || exit 1
[ -f .bench_data/seldot_ab_r3.log ] || exit 1
grep -q '"rates"' .bench_data/mfu_bound.json 2>/dev/null || exit 1
exit 0

#!/bin/bash
# True (exit 0) iff every round-4 evidence artifact exists.
cd /root/repo
for out in slb_cone_25_lrfast slb_cone_50_lrfast slb_cone_75_lrfast \
           chest_cone_25_lrfast chest_cone_50_lrfast chest_cone_75_lrfast \
           head_cone_25_lrfast head_cone_50_lrfast head_cone_75_lrfast \
           slb_parallel_50_lrfast slb_cone_25 head_cone_50; do
  [ -f output/$out/test/iter_030000/eval3d.yml ] || { echo "missing: $out"; exit 1; }
done
[ -f .bench_data/tpu_tests_r4.ok ] || { echo "missing: tpu tests"; exit 1; }
python - <<'EOF' || { echo "missing: bench_r4_queue.json value"; exit 1; }
import json, sys
try:
    d = json.load(open(".bench_data/bench_r4_queue.json"))
    sys.exit(0 if d.get("value") else 1)
except Exception:
    sys.exit(1)
EOF
echo "round-4 queue artifacts complete"

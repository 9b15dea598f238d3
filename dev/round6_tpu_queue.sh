#!/bin/bash
# Round-6 evidence queue (run AFTER the ladder A/B decision is flipped into
# the splat2d defaults). Serialized on the TPU advisory lock; every step
# idempotent-ish and timeout-bounded.
#   A. chunk_timeline 10k   — the "after" arm of the late-state cost story
#   B. full_run 30k lrfast  — flagship wall-clock + quality (VERDICT #2)
#   C. slb_cone_50 datagen  — input for the NAF protocol run
#   D. NAF convert -> init -> train (saxnerf 3e-5) -> test (VERDICT #4+#5)
#   E. mfu_bound at 10k + stress states (VERDICT #6)
#   F. kernel_profile at 10k (pair census, after-arm)
#   G. bench.py             — two-window sustained-honest headline (VERDICT #3)
set -x
cd /root/repo
LOCK="flock -w 14400 .bench_data/tpu.lock"

$LOCK timeout 2400 python dev/chunk_timeline.py 10000 \
  2>&1 | tee .bench_data/chunk_timeline_r6_after.log \
  || echo "STEP FAILED: timeline"

$LOCK timeout 3000 python dev/full_run_30k.py --preset lrfast --tag lrfast \
  2>&1 | tee .bench_data/full_run_lrfast.log || echo "STEP FAILED: full_run"

if [ ! -f data/slb_cone_50/meta_data.json ]; then
  $LOCK timeout 2400 python data_generator/generate_synthetic.py \
    --phantom shepp_logan --vol_size 256 --blur 1.0 \
    --scanner data_generator/scanner/cone_beam.yml \
    --output data/slb_cone_50 --n_train 50 --n_test 100 \
    || echo "STEP FAILED: datagen"
fi
mkdir -p data/sax-nerf
if [ ! -f data/sax-nerf/slb_naf_50.pickle ]; then
  python scripts/ours_to_naf_format.py --data data/slb_cone_50 \
    --output data/sax-nerf/slb_naf_50.pickle || echo "STEP FAILED: convert"
fi
if [ ! -f data/sax-nerf/init_slb_naf_50.npy ]; then
  $LOCK timeout 1800 python initialize_pcd.py \
    --data data/sax-nerf/slb_naf_50.pickle || echo "STEP FAILED: naf init"
fi
$LOCK timeout 5400 python scripts/train_all_saxnerf.py \
  --source data/sax-nerf --output output/saxnerf \
  --extra --test_iterations 30000 \
  2>&1 | tee .bench_data/naf_train.log || echo "STEP FAILED: naf train"
$LOCK timeout 1800 python test.py --model_path output/saxnerf/slb_naf_50 \
  2>&1 | tee .bench_data/naf_test.log || echo "STEP FAILED: naf test"

$LOCK timeout 1800 python dev/mfu_bound.py state_slb_10000.npz \
  > .bench_data/mfu_bound_10k.json 2> .bench_data/mfu_bound_10k.err \
  || echo "STEP FAILED: mfu 10k"
$LOCK timeout 1800 python dev/mfu_bound.py state_1100.npz \
  > .bench_data/mfu_bound.json 2> .bench_data/mfu_bound.err \
  || echo "STEP FAILED: mfu stress"

$LOCK timeout 1200 python dev/kernel_profile.py state_slb_10000.npz auto \
  2>&1 | tee .bench_data/kernel_profile_r6.log || echo "STEP FAILED: kprofile"

timeout 1500 python bench.py > .bench_data/bench_r6_final.json 2>/dev/null \
  || echo "STEP FAILED: bench"

echo "ROUND6 QUEUE DONE"

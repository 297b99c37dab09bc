#!/bin/bash
# Round-4 dataset regeneration (CPU-only; datasets/ is gitignored and did
# not survive the round boundary). Exact round-3 eval protocol seeds.
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
G="python tools/make_synthetic_dataset.py"
set -x
$G --out datasets/synth_osd         --n 200 --seed 1000 --depth-range 250 1500
$G --out datasets/synth_osd_convex  --n 200 --seed 1000 --depth-range 250 1500 --shapes convex
$G --out datasets/synth_osd_concave --n 200 --seed 1000 --depth-range 250 1500 --shapes concave
$G --layout ocid   --out datasets/synth_ocid   --n 36
$G --layout wisdom --out datasets/synth_wisdom --n 16
$G --layout hope   --out datasets/synth_hope   --n 16
$G --layout dopose --out datasets/synth_dopose --n 16
# disjoint eval-seed set for the noise-bound row (tools/r4_tail.sh stage
# eval_noise_s2000 depends on it; omission flagged by ADVICE r4)
$G --out datasets/synth_osd_s2000   --n 200 --seed 2000 --depth-range 250 1500
touch datasets/.r4_ready
echo DATASETS_DONE

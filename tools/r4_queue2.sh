#!/bin/bash
# Round-4 chip queue, part 2 — run AFTER tools/r4_queue.sh completes:
# trained-flagship rows through every real-dataset walker twin (VERDICT r3
# item 5's harness smokes), the open-vocab detector-strength leg (item 6),
# and the final bench.py measurement with the adaptive grouping + fenced
# streaming methodology (items 3 + 4).
set -u
cd /root/repo
mkdir -p output/r4
Q=output/r4

stage () {
  local name=$1; shift
  if [ -f "$Q/$name.done" ]; then echo "[skip] $name"; return 0; fi
  echo "[run ] $name: $*" | tee -a $Q/queue.log
  local t0=$SECONDS
  if "$@" >"$Q/$name.log" 2>&1; then
    echo "[ ok ] $name ($((SECONDS - t0)) s)" | tee -a $Q/queue.log
    touch "$Q/$name.done"
  else
    echo "[FAIL] $name ($((SECONDS - t0)) s) — see $Q/$name.log" | tee -a $Q/queue.log
    tail -3 "$Q/$name.log" | tee -a $Q/queue.log
  fi
}

# --- code-drift control: the r3c flagship checkpoint re-evaluated under
#     the round-4 code (adaptive grouping) must reproduce the round-3 row;
#     also the same-code anchor for the ablation-grid deltas ---
stage eval_r3c_recheck python run_eval.py \
  --config-file configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml \
  --base-model perturbed-gt --refiner-model maskrefiner --test-dataset OSD \
  --dataset-path datasets/synth_osd --weights-file output/flagship_synth_r3c/ckpt \
  --limit 200 --csv eval_ablation_synth.csv --tag "flagship-r3c-recheck|r4-code|per-image"

# --- walker harness smokes with the trained flagship: every real-dataset
#     walker produces a CSV row on its synthetic layout twin ---
for ds in OCID WISDOM HOPE DoPose; do
  low=$(echo $ds | tr 'A-Z' 'a-z')
  stage walker_$ds python run_eval.py --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset $ds \
    --dataset-path datasets/synth_$low \
    --weights-file output/flagship_synth_r3c/ckpt \
    --csv eval_walkers_synth.csv --tag "flagship_synth_r3c|walker-twin"
done

# --- validate the reworked bench (adaptive-K default config + fenced
#     streaming) before the driver's own round-end run ---
stage bench_r4 python bench.py

# --- open-vocab detector-strength leg: a 4x-longer detic stand-in run
#     separates detector quality from threshold as the refined-plateau
#     cause (VERDICT r3 item 6) ---
stage train_detic8k python tools/train_zoo.py --model detic --lr 1e-4 \
  --max-iter 8000 --output-dir output/detic_synth_8k
stage sweep_detic8k_0.5 env QUBER_DETIC_CKPT=output/detic_synth_8k/ckpt \
  QUBER_DETIC_THRESH=0.5 \
  python run_eval.py --base-model detic --refiner-model maskrefiner \
  --test-dataset OSD --dataset-path datasets/synth_osd \
  --weights-file output/flagship_synth_r3c/ckpt --limit 100 \
  --csv eval_openvocab_sweep.csv --tag "detic8k|thr0.5|r3c"
stage sweep_detic8k_0.3 env QUBER_DETIC_CKPT=output/detic_synth_8k/ckpt \
  QUBER_DETIC_THRESH=0.3 \
  python run_eval.py --base-model detic --refiner-model maskrefiner \
  --test-dataset OSD --dataset-path datasets/synth_osd \
  --weights-file output/flagship_synth_r3c/ckpt --limit 100 \
  --csv eval_openvocab_sweep.csv --tag "detic8k|thr0.3|r3c"

echo QUEUE2_COMPLETE | tee -a $Q/queue.log

#!/bin/bash
# Round-4 chip queue, part 3 — reprioritized for the wall-clock budget:
# quick critical block (r3c re-eval anchor, walker rows, bench validation),
# then the remaining ablation-grid rows, then seeds, then the open-vocab
# sweep + CGNet row. Stages use fresh names; outputs land in the canonical
# places. Failures do not block later stages.
set -u
cd /root/repo
mkdir -p output/r4
Q=output/r4

PROTO="--synthetic --synthetic-size 448 --n-objects 3 20 --depth-range 250 1500 \
       --max-iter 12000 --checkpoint-period 2000 --device-targets --target-slots 24"

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

ev () {  # ev <config> <ckpt> <dataset-dir> <csv> <tag>
  python run_eval.py --config-file configs/$1.yaml --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset OSD --dataset-path datasets/$3 \
    --weights-file $2 --limit 200 --csv $4 --tag "$5"
}

# --- 1. quick critical block ---
stage q3_r3c_recheck python run_eval.py \
  --config-file configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml \
  --base-model perturbed-gt --refiner-model maskrefiner --test-dataset OSD \
  --dataset-path datasets/synth_osd --weights-file output/flagship_synth_r3c/ckpt \
  --limit 200 --csv eval_ablation_synth.csv --tag "flagship-r3c-recheck|r4-code|per-image"

for ds in OCID WISDOM HOPE DoPose; do
  low=$(echo $ds | tr 'A-Z' 'a-z')
  stage q3_walker_$ds python run_eval.py --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset $ds \
    --dataset-path datasets/synth_$low \
    --weights-file output/flagship_synth_r3c/ckpt \
    --csv eval_walkers_synth.csv --tag "flagship_synth_r3c|walker-twin"
done

stage q3_bench python bench.py

# --- 2. remaining ablation-grid rows (VERDICT item 1 completeness) ---
for ab in rgb_only rgbd_add_l3; do
  cfg=mask_refiner_$ab
  stage q3_train_$ab python train_net.py --config-file configs/$cfg.yaml $PROTO \
    --output-dir output/ablation_$ab
  stage q3_eval_$ab ev $cfg output/ablation_$ab/ckpt synth_osd \
    eval_ablation_synth.csv "ablation:$ab|r3-proto|per-image"
done

# --- 3. seeds (VERDICT item 2), most-valuable-first ---
for s in 77 777 7777; do
  stage q3_train_seed$s python train_net.py \
    --config-file configs/seeds/flagship_seed$s.yaml $PROTO --output-dir output/seed$s
  stage q3_eval_seed${s}_mixed   ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd \
    eval_seeds_synth.csv "seed$s|mixed|r3-proto"
  stage q3_eval_seed${s}_convex  ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_convex \
    eval_seeds_synth.csv "seed$s|convex|r3-proto"
  stage q3_eval_seed${s}_concave ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_concave \
    eval_seeds_synth.csv "seed$s|concave|r3-proto"

  # cheap high-value items squeezed between seed runs, earliest first
  if [ "$s" = "77" ]; then
    for thr in 0.5 0.3 0.15; do
      stage q3_sweep_detic_$thr env QUBER_DETIC_CKPT=output/detic_synth/ckpt \
        QUBER_DETIC_THRESH=$thr \
        python run_eval.py --base-model detic --refiner-model maskrefiner \
        --test-dataset OSD --dataset-path datasets/synth_osd \
        --weights-file output/flagship_synth_r3c/ckpt --limit 100 \
        --csv eval_openvocab_sweep.csv --tag "detic|thr$thr|r3c"
    done
    for thr in 0.25 0.05; do
      stage q3_sweep_gsam_$thr env QUBER_GSAM_CKPT=output/gsam_synth/ckpt \
        QUBER_GSAM_THRESH=$thr \
        python run_eval.py --base-model grounded-sam --refiner-model maskrefiner \
        --test-dataset OSD --dataset-path datasets/synth_osd \
        --weights-file output/flagship_synth_r3c/ckpt --limit 100 \
        --csv eval_openvocab_sweep.csv --tag "gsam|thr$thr|r3c"
    done
  fi
  if [ "$s" = "777" ]; then
    stage q3_train_cgnet python tools/train_fg.py --model cgnet \
      --dataset-path datasets/synth_osd --max-iter 1500 --output-dir output/fg_cgnet
    stage q3_eval_cgnet_filter env QUBER_CGNET_CKPT=output/fg_cgnet/ckpt \
      python run_eval.py --base-model perturbed-gt --refiner-model maskrefiner \
      --use-cgnet --test-dataset OSD --dataset-path datasets/synth_osd \
      --weights-file output/flagship_synth_r3c/ckpt --limit 200 \
      --csv eval_synth.csv --tag "flagship_synth_r3c|cgnet-filter|per-image"
  fi
done

echo QUEUE3_COMPLETE | tee -a $Q/queue.log

#!/bin/bash
# Round-4 chip queue (actual execution order). One real TPU chip, one
# process at a time. Differences vs the planned r4_queue*.sh: the round-3
# flagship orbax checkpoint did not survive the round boundary, so every
# flagship-eval stage uses the shipped int8 artifact
# (weights/flagship_synth_int8.npz — verified metric-neutral within
# 0.2 pts, EVAL_SYNTH.md), and stages are ordered cheap-critical-first so
# driver-facing artifacts (bench.py, anchor row, walker rows) exist even
# if the wall clock cuts the tail.
set -u
cd /root/repo
mkdir -p output/r4
Q=output/r4
FLAG=weights/flagship_synth_int8.npz
FCFG=configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml

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
  local cfg=$1 ckpt=$2 ds=$3 csv=$4 tag=$5
  python run_eval.py --config-file configs/$cfg.yaml --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset OSD --dataset-path datasets/$ds \
    --weights-file $ckpt --limit 200 --csv $csv --tag "$tag"
}

wait_datasets () {
  while [ ! -f datasets/.r4_ready ]; do sleep 10; done
}

# --- 1. 10-iter presmokes: validate each ablation config through the exact
#        device-target packed train path before committing a 45-min slot ---
for ab in noeee nohf rgb_only rgbd_add_l3; do
  stage presmoke_$ab python train_net.py --config-file configs/mask_refiner_$ab.yaml \
    --synthetic --synthetic-size 8 --n-objects 3 20 --depth-range 250 1500 \
    --max-iter 10 --checkpoint-period 10 --device-targets --target-slots 24 \
    --log-period 5 --output-dir /tmp/presmoke_$ab
done

# --- 2. bench validation (adaptive-K grouping + fenced streaming are new
#        since the last chip run; the driver reruns this at round end) ---
stage bench_r4 python bench.py

# --- 3. anchor + cheap eval rows (need datasets) ---
wait_datasets
stage anchor_r3c_int8 python run_eval.py --config-file $FCFG \
  --base-model perturbed-gt --refiner-model maskrefiner --test-dataset OSD \
  --dataset-path datasets/synth_osd --weights-file $FLAG \
  --limit 200 --csv eval_ablation_synth.csv --tag "flagship-r3c-int8|r4-code|per-image"

for ds in OCID WISDOM HOPE DoPose; do
  low=$(echo $ds | tr 'A-Z' 'a-z')
  stage walker_$ds python run_eval.py --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset $ds \
    --dataset-path datasets/synth_$low --weights-file $FLAG \
    --csv eval_walkers_synth.csv --tag "flagship-r3c-int8|walker-twin"
done

# --- 4. ablation grid (VERDICT item 1): round-3 protocol matched to the
#        r3c flagship run; eval on the mixed held-out set n=200 ---
for ab in noeee nohf rgb_only rgbd_add_l3; do
  cfg=mask_refiner_$ab
  stage train_$ab python train_net.py --config-file configs/$cfg.yaml $PROTO \
    --output-dir output/ablation_$ab
  stage eval_$ab ev $cfg output/ablation_$ab/ckpt synth_osd \
    eval_ablation_synth.csv "ablation:$ab|r3-proto|per-image"
done

# --- 5. CGNet trained no-harm row (VERDICT item 8) ---
stage train_cgnet python tools/train_fg.py --model cgnet \
  --dataset-path datasets/synth_osd --max-iter 1500 --output-dir output/fg_cgnet
stage eval_cgnet_filter env QUBER_CGNET_CKPT=output/fg_cgnet/ckpt \
  python run_eval.py --base-model perturbed-gt --refiner-model maskrefiner \
  --use-cgnet --test-dataset OSD --dataset-path datasets/synth_osd \
  --weights-file $FLAG --limit 200 \
  --csv eval_synth.csv --tag "flagship-r3c-int8|cgnet-filter|per-image"

# --- 6. open-vocab stand-ins (round-3 ckpts gone: retrain 2k iters) +
#        threshold sweep (VERDICT item 6) ---
stage train_detic python tools/train_zoo.py --model detic --max-iter 2000 \
  --output-dir output/detic_synth
stage train_gsam  python tools/train_zoo.py --model gsam  --max-iter 2000 \
  --output-dir output/gsam_synth
for thr in 0.5 0.3 0.15; do
  stage sweep_detic_$thr env QUBER_DETIC_CKPT=output/detic_synth/ckpt \
    QUBER_DETIC_THRESH=$thr \
    python run_eval.py --base-model detic --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "detic|thr$thr|r3c-int8"
done
for thr in 0.25 0.05; do
  stage sweep_gsam_$thr env QUBER_GSAM_CKPT=output/gsam_synth/ckpt \
    QUBER_GSAM_THRESH=$thr \
    python run_eval.py --base-model grounded-sam --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "gsam|thr$thr|r3c-int8"
done

# --- 7. 3-seed protocol (VERDICT item 2), as the wall clock allows ---
for s in 77 777 7777; do
  stage train_seed$s python train_net.py \
    --config-file configs/seeds/flagship_seed$s.yaml $PROTO --output-dir output/seed$s
  stage eval_seed${s}_mixed   ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd \
    eval_seeds_synth.csv "seed$s|mixed|r3-proto"
  stage eval_seed${s}_convex  ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_convex \
    eval_seeds_synth.csv "seed$s|convex|r3-proto"
  stage eval_seed${s}_concave ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_concave \
    eval_seeds_synth.csv "seed$s|concave|r3-proto"
done

echo QUEUE_COMPLETE | tee -a $Q/queue.log

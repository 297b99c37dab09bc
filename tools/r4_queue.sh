#!/bin/bash
# Round-4 chip work queue: ablation grid + 3-seed protocol + CGNet row +
# open-vocab threshold sweep (VERDICT r3 items 1, 2, 6, 8). Sequential —
# the one real TPU chip serves one process at a time. Each stage logs to
# output/r4/<stage>.log and failures do not block later stages.
set -u
cd /root/repo
mkdir -p output/r4
Q=output/r4

PROTO="--synthetic --synthetic-size 448 --n-objects 3 20 --depth-range 250 1500 \
       --max-iter 12000 --checkpoint-period 2000 --device-targets --target-slots 24"

stage () {  # stage <name> <cmd...>
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

# --- 0. fast eval-path smokes for the configs that change predictor I/O ---
stage smoke_eval_noeee python run_eval.py --config-file configs/mask_refiner_noeee.yaml \
  --base-model perturbed-gt --refiner-model maskrefiner --test-dataset OSD \
  --dataset-path datasets/synth_osd --limit 2 --csv /tmp/smoke_eval.csv --tag smoke
stage smoke_eval_rgbonly python run_eval.py --config-file configs/mask_refiner_rgb_only.yaml \
  --base-model perturbed-gt --refiner-model maskrefiner --test-dataset OSD \
  --dataset-path datasets/synth_osd --limit 2 --csv /tmp/smoke_eval.csv --tag smoke

# --- 0b. 10-iter train pre-smokes: validate each config through the exact
#         device-target packed path before committing a 45-min slot ---
for ab in noeee nohf rgb_only rgbd_add_l3; do
  stage presmoke_$ab python train_net.py --config-file configs/mask_refiner_$ab.yaml \
    --synthetic --synthetic-size 8 --n-objects 3 20 --depth-range 250 1500 \
    --max-iter 10 --checkpoint-period 10 --device-targets --target-slots 24 \
    --log-period 5 --output-dir /tmp/presmoke_$ab
done

# --- 1. ablation grid (VERDICT item 1): round-3 protocol, matched to the
#        flagship r3c run; eval on the mixed held-out set n=200 ---
for ab in noeee nohf rgb_only rgbd_add_l3; do
  cfg=mask_refiner_$ab
  stage train_$ab python train_net.py --config-file configs/$cfg.yaml $PROTO \
    --output-dir output/ablation_$ab
  stage eval_$ab ev $cfg output/ablation_$ab/ckpt synth_osd \
    eval_ablation_synth.csv "ablation:$ab|r3-proto|per-image"
done

# --- 2. 3-seed protocol (VERDICT item 2): flagship config, seeds 77/777/7777,
#        eval on all three shape sets ---
for s in 77 777 7777; do
  stage train_seed$s python train_net.py --config-file configs/seeds/flagship_seed$s.yaml \
    $PROTO --output-dir output/seed$s
  stage eval_seed${s}_mixed   ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd \
    eval_seeds_synth.csv "seed$s|mixed|r3-proto"
  stage eval_seed${s}_convex  ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_convex \
    eval_seeds_synth.csv "seed$s|convex|r3-proto"
  stage eval_seed${s}_concave ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_concave \
    eval_seeds_synth.csv "seed$s|concave|r3-proto"
done

# --- 3. CGNet trained no-harm row (VERDICT item 8) ---
stage train_cgnet python tools/train_fg.py --model cgnet \
  --dataset-path datasets/synth_osd --max-iter 1500 --output-dir output/fg_cgnet
stage eval_cgnet_filter env QUBER_CGNET_CKPT=output/fg_cgnet/ckpt \
  python run_eval.py --base-model perturbed-gt --refiner-model maskrefiner \
  --use-cgnet --test-dataset OSD --dataset-path datasets/synth_osd \
  --weights-file output/flagship_synth_r3c/ckpt --limit 200 \
  --csv eval_synth.csv --tag "flagship_synth_r3c|cgnet-filter|per-image"

# --- 4. open-vocab threshold sweep (VERDICT item 6): existing detic/gsam
#        stand-in checkpoints, confidence threshold swept ---
for thr in 0.5 0.3 0.15; do
  stage sweep_detic_$thr env QUBER_DETIC_CKPT=output/detic_synth/ckpt \
    QUBER_DETIC_THRESH=$thr \
    python run_eval.py --base-model detic --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file output/flagship_synth_r3c/ckpt --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "detic|thr$thr|r3c"
done
for thr in 0.25 0.05; do
  stage sweep_gsam_$thr env QUBER_GSAM_CKPT=output/gsam_synth/ckpt \
    QUBER_GSAM_THRESH=$thr \
    python run_eval.py --base-model grounded-sam --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file output/flagship_synth_r3c/ckpt --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "gsam|thr$thr|r3c"
done

# --- 5. stretch: stock Panoptic-DeepLab (no offset input) ---
stage train_pd python train_net.py --config-file configs/panoptic_deeplab.yaml $PROTO \
  --output-dir output/ablation_pd
stage eval_pd ev panoptic_deeplab output/ablation_pd/ckpt synth_osd \
  eval_ablation_synth.csv "ablation:panoptic_deeplab|r3-proto|per-image"

echo QUEUE_COMPLETE | tee -a $Q/queue.log

#!/bin/bash
# Round-5 chip queue. One real TPU chip, one process at a time.
#
# Ordering (VERDICT r4 "Next round"):
#   A. open-vocab threshold sweep (item 4) — detic ckpt SURVIVED the round
#      boundary (restore verified green this round; the r4 failure was the
#      round boundary killing the stage mid-restore, see PROGRESS.md), so
#      the detic legs cost eval time only; gsam needs its 2k-iter retrain.
#   B. discriminating ablation part 1 (item 1): train UCN, then evaluate
#      flagship + nohf (ckpt survived) on ITS masks. noeee leg follows its
#      retrain in D.
#   C. 3-seed protocol (item 2) — explicitly first among the big trains;
#      the three seed configs compile to the SAME XLA program (seed only
#      changes PRNGKey data), so trains 2-3 start warm via the persistent
#      compilation cache (~/.cache/quber_jax, quber_tpu/__init__.py).
#   D. noeee retrain (r4 run died with an empty log — buffered stdout lost
#      on kill; everything here runs python -u) + its perturbed-gt row +
#      the noeee discriminating leg + the back-to-back timing trio
#      (ADVICE r4 medium: same-load ms/frame for all three variants).
#   E. grid completion (item 3): rgb_only, rgbd_add_l3.
#
# All stages are skip-markered: re-running this script resumes the queue.
set -u
cd /root/repo
mkdir -p output/r5
Q=output/r5
FLAG=weights/flagship_synth_int8.npz
FCFG=configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml
export PYTHONUNBUFFERED=1

PROTO="--synthetic --synthetic-size 448 --n-objects 3 20 --depth-range 250 1500 \
       --max-iter 12000 --checkpoint-period 2000 --device-targets --target-slots 24"

stage () {
  local name=$1; shift
  if [ -f "$Q/$name.done" ]; then echo "[skip] $name"; return 0; fi
  echo "[run ] $name: $*" | tee -a $Q/queue.log
  local t0=$SECONDS
  if "$@" >"$Q/$name.log" 2>&1; then
    local dt=$((SECONDS - t0))
    # compile-vs-run visibility (VERDICT item 7): stages print
    # "[timing] compile_s=…" when they can measure time-to-first-step
    local comp=$(grep -o 'compile_s=[0-9.]*' "$Q/$name.log" | tail -1)
    echo "[ ok ] $name ($dt s) ${comp:-}" | tee -a $Q/queue.log
    touch "$Q/$name.done"
  else
    echo "[FAIL] $name ($((SECONDS - t0)) s) — see $Q/$name.log" | tee -a $Q/queue.log
    tail -3 "$Q/$name.log" | tee -a $Q/queue.log
  fi
}

ev () {  # ev <config> <ckpt> <dataset-dir> <csv> <tag> [extra args...]
  local cfg=$1 ckpt=$2 ds=$3 csv=$4 tag=$5; shift 5
  python -u run_eval.py --config-file configs/$cfg.yaml --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset OSD --dataset-path datasets/$ds \
    --weights-file $ckpt --limit 200 --csv $csv --tag "$tag" "$@"
}

# UCN-base discriminating eval: refiner variant on the trained detector's masks
dev () {  # dev <config> <ckpt> <tag>
  local cfg=$1 ckpt=$2 tag=$3
  env QUBER_UCN_CKPT=output/ucn_synth/ckpt python -u run_eval.py \
    --config-file configs/$cfg.yaml --base-model ucn --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $ckpt --limit 100 --csv eval_ablation_synth.csv --tag "$tag"
}

# --- A. open-vocab threshold/strength sweep (VERDICT item 4) ---
for thr in 0.5 0.3 0.15; do
  stage sweep_detic_$thr env QUBER_DETIC_CKPT=output/detic_synth/ckpt \
    QUBER_DETIC_THRESH=$thr \
    python -u run_eval.py --base-model detic --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "detic|thr$thr|r3c-int8"
done
stage train_gsam python -u tools/train_zoo.py --model gsam --max-iter 2000 \
  --output-dir output/gsam_synth
for thr in 0.25 0.05; do
  stage sweep_gsam_$thr env QUBER_GSAM_CKPT=output/gsam_synth/ckpt \
    QUBER_GSAM_THRESH=$thr \
    python -u run_eval.py --base-model grounded-sam --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "gsam|thr$thr|r3c-int8"
done

# --- B. discriminating ablation, part 1 (VERDICT item 1) ---
stage train_ucn python -u tools/train_zoo.py --model ucn --max-iter 2000 \
  --output-dir output/ucn_synth
stage disc_flagship_ucn dev mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8 \
  $FLAG "disc:flagship|base:ucn|r3c-int8"
stage disc_nohf_ucn dev mask_refiner_nohf output/ablation_nohf/ckpt \
  "disc:nohf|base:ucn|r4-ckpt"

# --- bench validation gate: once bench.py round-5 edits (MFU line,
#     link_swing fix, default-config breakdown) are in, the builder
#     touches output/r5/.bench_ready and the next queue pass runs it ---
if [ -f $Q/.bench_ready ]; then
  stage bench_r5 python -u bench.py
fi

# --- C. 3-seed protocol (VERDICT item 2) ---
for s in 77 777 7777; do
  stage train_seed$s python -u train_net.py \
    --config-file configs/seeds/flagship_seed$s.yaml $PROTO --output-dir output/seed$s
  stage eval_seed${s}_mixed   ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd \
    eval_seeds_synth.csv "seed$s|mixed|r3-proto"
  stage eval_seed${s}_convex  ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_convex \
    eval_seeds_synth.csv "seed$s|convex|r3-proto"
  stage eval_seed${s}_concave ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_concave \
    eval_seeds_synth.csv "seed$s|concave|r3-proto"
done

if [ -f $Q/.bench_ready ] && [ ! -f $Q/bench_r5.done ]; then
  stage bench_r5 python -u bench.py
fi

# --- D. noeee retrain + rows ---
stage train_noeee python -u train_net.py --config-file configs/mask_refiner_noeee.yaml \
  $PROTO --output-dir output/ablation_noeee
stage eval_noeee_r5 ev mask_refiner_noeee output/ablation_noeee/ckpt synth_osd \
  eval_ablation_synth.csv "ablation:noeee|r5-train|per-image"
stage disc_noeee_ucn dev mask_refiner_noeee output/ablation_noeee/ckpt \
  "disc:noeee|base:ucn|r5-ckpt"

# back-to-back timing trio under identical load (ADVICE r4 medium):
# same 50 scenes, same process environment, sequential
stage timing_flagship ev mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8 \
  $FLAG synth_osd eval_ablation_synth.csv "timing-trio:flagship|back-to-back" --limit 50
stage timing_nohf ev mask_refiner_nohf output/ablation_nohf/ckpt synth_osd \
  eval_ablation_synth.csv "timing-trio:nohf|back-to-back" --limit 50
stage timing_noeee ev mask_refiner_noeee output/ablation_noeee/ckpt synth_osd \
  eval_ablation_synth.csv "timing-trio:noeee|back-to-back" --limit 50

# --- E. grid completion (VERDICT item 3) ---
for ab in rgb_only rgbd_add_l3; do
  stage train_$ab python -u train_net.py --config-file configs/mask_refiner_$ab.yaml \
    $PROTO --output-dir output/ablation_$ab
  stage eval_$ab ev mask_refiner_$ab output/ablation_$ab/ckpt synth_osd \
    eval_ablation_synth.csv "ablation:$ab|r3-proto|per-image"
done

if [ -f $Q/.bench_ready ] && [ ! -f $Q/bench_r5.done ]; then
  stage bench_r5 python -u bench.py
fi

echo QUEUE_COMPLETE | tee -a $Q/queue.log

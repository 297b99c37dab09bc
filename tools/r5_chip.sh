#!/bin/bash
# Round-5 chip queue, session-2 revision. One real TPU chip, one process
# at a time. The session boundary wiped output/ + datasets/ + ~/.cache, so
# every checkpoint referenced here is retrained in-queue.
#
# Ordering (VERDICT r4 top_next: discriminating ablation first, then the
# twice-slipped 3-seed protocol, then the grid tail):
#   A. open-vocab threshold sweep — COMPLETED earlier this round (5 rows
#      committed in eval_openvocab_sweep.csv, commit 678a4c1); stages are
#      pre-marked done below because the stand-in checkpoints did not
#      survive the session boundary and the rows already exist.
#   B. discriminating ablation (VERDICT item 1): train UCN 2k, retrain
#      nohf + noeee at the matched 12k protocol (both r4 ckpts wiped),
#      then evaluate flagship/nohf/noeee on UCN's masks — plus fresh
#      perturbed-gt rows from the same bf16 ckpts (replicates the r4
#      finding without the int8-vs-bf16 anchor asymmetry, ADVICE r4) and
#      the back-to-back same-load timing trio (ADVICE r4 medium).
#   C. bench_r5 — round-5 bench edits (MFU, gap attribution, adaptive
#      top-k) are committed; run early for gap-closure evidence.
#   D. 3-seed protocol (VERDICT item 2): three 12k trains sharing one XLA
#      program via the persistent compile cache; mixed eval first per
#      seed so partial results are usable if the clock runs out.
#   E. grid completion (VERDICT item 3): rgb_only, rgbd_add_l3.
#
# All stages are skip-markered: re-running this script resumes the queue.
set -u
cd /root/repo
mkdir -p output/r5
Q=output/r5
FLAG=weights/flagship_synth_int8.npz
FCFG=mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8
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

# wait for the CPU-side dataset regeneration before eval stages
need_data () {
  while [ ! -f datasets/.r4_ready ]; do sleep 20; done
}

ev () {  # ev <config> <ckpt> <dataset-dir> <csv> <tag> [extra args...]
  local cfg=$1 ckpt=$2 ds=$3 csv=$4 tag=$5; shift 5
  need_data
  python -u run_eval.py --config-file configs/$cfg.yaml --base-model perturbed-gt \
    --refiner-model maskrefiner --test-dataset OSD --dataset-path datasets/$ds \
    --weights-file $ckpt --limit 200 --csv $csv --tag "$tag" "$@"
}

# UCN-base discriminating eval: refiner variant on the trained detector's masks
dev () {  # dev <config> <ckpt> <tag>
  local cfg=$1 ckpt=$2 tag=$3
  need_data
  env QUBER_UCN_CKPT=output/ucn_synth/ckpt python -u run_eval.py \
    --config-file configs/$cfg.yaml --base-model ucn --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $ckpt --limit 100 --csv eval_ablation_synth.csv --tag "$tag"
}

# --- A. open-vocab sweep: completed earlier this round (commit 678a4c1) ---
for m in sweep_detic_0.5 sweep_detic_0.3 sweep_detic_0.15 train_gsam \
         sweep_gsam_0.25 sweep_gsam_0.05; do
  [ -f "$Q/$m.done" ] || { touch "$Q/$m.done"; echo "[pre ] $m (rows committed r5s1)" >> $Q/queue.log; }
done

# --- B. discriminating ablation (VERDICT item 1) ---
stage train_ucn python -u tools/train_zoo.py --model ucn --max-iter 2000 \
  --output-dir output/ucn_synth
stage train_nohf python -u train_net.py --config-file configs/mask_refiner_nohf.yaml \
  $PROTO --output-dir output/ablation_nohf
stage disc_flagship_ucn dev $FCFG $FLAG "disc:flagship|base:ucn|r3c-int8"
stage disc_nohf_ucn dev mask_refiner_nohf output/ablation_nohf/ckpt \
  "disc:nohf|base:ucn|r5-ckpt"
stage eval_nohf_r5 ev mask_refiner_nohf output/ablation_nohf/ckpt synth_osd \
  eval_ablation_synth.csv "ablation:nohf|r5-train|bf16"
stage train_noeee python -u train_net.py --config-file configs/mask_refiner_noeee.yaml \
  $PROTO --output-dir output/ablation_noeee
stage disc_noeee_ucn dev mask_refiner_noeee output/ablation_noeee/ckpt \
  "disc:noeee|base:ucn|r5-ckpt"
stage eval_noeee_r5 ev mask_refiner_noeee output/ablation_noeee/ckpt synth_osd \
  eval_ablation_synth.csv "ablation:noeee|r5-train|bf16"

# back-to-back timing trio under identical load (ADVICE r4 medium):
# same 50 scenes, same process environment, sequential
stage timing_flagship ev $FCFG $FLAG synth_osd \
  eval_ablation_synth.csv "timing-trio:flagship|back-to-back" --limit 50
stage timing_nohf ev mask_refiner_nohf output/ablation_nohf/ckpt synth_osd \
  eval_ablation_synth.csv "timing-trio:nohf|back-to-back" --limit 50
stage timing_noeee ev mask_refiner_noeee output/ablation_noeee/ckpt synth_osd \
  eval_ablation_synth.csv "timing-trio:noeee|back-to-back" --limit 50

# --- C. bench with the round-5 MFU/gap-attribution edits ---
stage bench_r5 python -u bench.py

# --- D. 3-seed protocol (VERDICT item 2) ---
for s in 77 777 7777; do
  stage train_seed$s python -u train_net.py \
    --config-file configs/seeds/flagship_seed$s.yaml $PROTO --output-dir output/seed$s
  stage eval_seed${s}_mixed   ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd \
    eval_seeds_synth.csv "seed$s|mixed|r3-proto"
done
# secondary distribution rows only after every seed has its mixed row
for s in 77 777 7777; do
  stage eval_seed${s}_convex  ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_convex \
    eval_seeds_synth.csv "seed$s|convex|r3-proto"
  stage eval_seed${s}_concave ev seeds/flagship_seed$s output/seed$s/ckpt synth_osd_concave \
    eval_seeds_synth.csv "seed$s|concave|r3-proto"
done

# --- E. grid completion (VERDICT item 3) ---
for ab in rgb_only rgbd_add_l3; do
  stage train_$ab python -u train_net.py --config-file configs/mask_refiner_$ab.yaml \
    $PROTO --output-dir output/ablation_$ab
  stage eval_$ab ev mask_refiner_$ab output/ablation_$ab/ckpt synth_osd \
    eval_ablation_synth.csv "ablation:$ab|r3-proto|per-image"
done

echo QUEUE_COMPLETE | tee -a $Q/queue.log

#!/bin/bash
# Round-4 tail 2: open-vocab stand-in retrains + threshold sweep (VERDICT r3
# item 6), staged in <=20-min increments so partial results land whenever the
# round cut comes. Run after r4_tail.sh.
set -u
cd /root/repo
mkdir -p output/r4
Q=output/r4
FLAG=weights/flagship_synth_int8.npz

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

stage train_detic python tools/train_zoo.py --model detic --max-iter 2000 \
  --output-dir output/detic_synth
for thr in 0.5 0.3 0.15; do
  stage sweep_detic_$thr env QUBER_DETIC_CKPT=output/detic_synth/ckpt \
    QUBER_DETIC_THRESH=$thr \
    python run_eval.py --base-model detic --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "detic|thr$thr|r3c-int8"
done
stage train_gsam python tools/train_zoo.py --model gsam --max-iter 2000 \
  --output-dir output/gsam_synth
for thr in 0.25 0.05; do
  stage sweep_gsam_$thr env QUBER_GSAM_CKPT=output/gsam_synth/ckpt \
    QUBER_GSAM_THRESH=$thr \
    python run_eval.py --base-model grounded-sam --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "gsam|thr$thr|r3c-int8"
done

# detector-strength leg: 4x-longer detic run separates detector quality
# from threshold as the refined-plateau cause
stage train_detic8k python tools/train_zoo.py --model detic --lr 1e-4 \
  --max-iter 8000 --output-dir output/detic_synth_8k
for thr in 0.5 0.3; do
  stage sweep_detic8k_$thr env QUBER_DETIC_CKPT=output/detic_synth_8k/ckpt \
    QUBER_DETIC_THRESH=$thr \
    python run_eval.py --base-model detic --refiner-model maskrefiner \
    --test-dataset OSD --dataset-path datasets/synth_osd \
    --weights-file $FLAG --limit 100 \
    --csv eval_openvocab_sweep.csv --tag "detic8k|thr$thr|r3c-int8"
done

echo TAIL2_COMPLETE | tee -a $Q/queue.log

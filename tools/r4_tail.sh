#!/bin/bash
# Round-4 tail: cheap certain wins for the last wall-clock window after the
# nohf ablation (rgb_only's 53-min slot no longer fits). Run manually after
# killing r4_chip.sh.
set -u
cd /root/repo
mkdir -p output/r4
Q=output/r4
FLAG=weights/flagship_synth_int8.npz
FCFG=configs/mask_refiner_rgbd_concat_l2_gn_hf_m_b_f_c_o_l3_e2_b8.yaml

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

# eval-sampling noise bound for the ablation table: the SAME int8 flagship
# on a disjoint eval-seed scene set (seed 2000 vs the protocol's 1000).
# The metric spread between the two rows bounds how much of an ablation
# delta could come from eval-set sampling alone.
stage eval_noise_s2000 python run_eval.py --config-file $FCFG \
  --base-model perturbed-gt --refiner-model maskrefiner --test-dataset OSD \
  --dataset-path datasets/synth_osd_s2000 --weights-file $FLAG \
  --limit 200 --csv eval_ablation_synth.csv \
  --tag "flagship-r3c-int8|eval-seed2000|per-image"

# CGNet trained no-harm row (VERDICT r3 item 8)
stage train_cgnet python tools/train_fg.py --model cgnet \
  --dataset-path datasets/synth_osd --max-iter 1500 --output-dir output/fg_cgnet
stage eval_cgnet_filter env QUBER_CGNET_CKPT=output/fg_cgnet/ckpt \
  python run_eval.py --base-model perturbed-gt --refiner-model maskrefiner \
  --use-cgnet --test-dataset OSD --dataset-path datasets/synth_osd \
  --weights-file $FLAG --limit 200 \
  --csv eval_synth.csv --tag "flagship-r3c-int8|cgnet-filter|per-image"

echo TAIL_COMPLETE | tee -a $Q/queue.log

#!/bin/bash
# Round-5 TPU queue: Kamani protocol-length + seed-robustness evidence
# (VERDICT r4 next-#5).
#
# The round-4 ep-999 orbax checkpoint lived in logs/ and did not survive
# the round boundary, so the "continue to 5000 epochs" item is realized
# by RE-RUNNING the validated two-stage escape protocol from scratch on
# the TPU and carrying it well past epoch 999:
#   stage 1 (corridor): exp_l2=0.0, epochs 0-199
#   stage 2 (raw-space exponent tether): exp_l2=0.03, epochs 200-...
# Same overrides as artifacts/kamani/stage{1,2}_*.json (seed 10,
# exp_bias=-0.55, pnet_zero, pnet_scale=100, lr 5e-6, l1 0.01, f32_ir).
#
# Budgeting (CLAUDE.md: f32_ir Kamani ~1.6 s/epoch; serialize TPU jobs;
# ~3 h round): seed-10 to epoch 3000 (8 closed-loop sweeps past the
# committed ep-999 evidence = plateau documentation), then the
# from-scratch seed-0 probe (round-3's unrecorded cpu_rescue_scratch_s0)
# to epoch 700 (200 corridor + 500 tether, its original spec).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/kamani logs

COMMON="exp_bias=-0.55 pnet_zero=1 pnet_scale=100 lr=5e-6 l1=0.01"

harvest() {  # harvest <run_dir> <tag>
  for f in "$1"/final_params.json; do
    [ -f "$f" ] && cp "$f" "artifacts/kamani/$2_final_params.json"
  done
  # latest Lissajous overlay figure
  last_fig=$(ls "$1"/fig_kamani_*.png 2>/dev/null | sort | tail -1)
  [ -n "${last_fig:-}" ] && cp "$last_fig" "artifacts/kamani/$2_$(basename "$last_fig")"
  # closed-loop eval lines from the run log (plot_every cadence)
  grep -a "closed-loop\|epoch.*loss" "$1"/log.txt 2>/dev/null | grep -a "closed-loop" \
    > "artifacts/kamani/$2_closed_loop.txt" || true
  echo "[chainK] harvested $2 at $(date)"
}

echo "[chainK] === seed-10 stage 1 (corridor, ep 0-199) at $(date) ==="
# shellcheck disable=SC2086
timeout 3600 python benchmarks/kamani_final.py r5full seed=10 $COMMON \
  exp_l2=0.0 epochs=200 plot_every=200
harvest logs/kamani_final_r5full r5_s10_ep199

echo "[chainK] === seed-10 stage 2 (tether, ep 200-2999) at $(date) ==="
# shellcheck disable=SC2086
timeout 9600 python benchmarks/kamani_final.py r5full seed=10 $COMMON \
  exp_l2=0.03 epochs=3000 plot_every=250
harvest logs/kamani_final_r5full r5_s10_ep2999

echo "[chainK] === seed-0 from-scratch stage 1 (ep 0-199) at $(date) ==="
# shellcheck disable=SC2086
timeout 2400 python benchmarks/kamani_final.py r5s0 seed=0 $COMMON \
  exp_l2=0.0 epochs=200 plot_every=200
harvest logs/kamani_final_r5s0 r5_s0_ep199

echo "[chainK] === seed-0 stage 2 (tether, ep 200-699) at $(date) ==="
# shellcheck disable=SC2086
timeout 3600 python benchmarks/kamani_final.py r5s0 seed=0 $COMMON \
  exp_l2=0.03 epochs=700 plot_every=250
harvest logs/kamani_final_r5s0 r5_s0_ep699

echo "[chainK] chain complete at $(date)"

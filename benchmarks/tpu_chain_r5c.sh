#!/bin/bash
# Round-5 session-2 TPU chain C: workload evidence (serialized after
# chain B's perf stages).
#
# 1. Kamani seed-2 two-stage protocol from scratch (ep 0-199 corridor +
#    tether to 699): the "second independent draw" VERDICT r4 weak-#5
#    asks for.  Round-3's natural-init battery had seed 2 escaping the
#    lazy basin; this tests the protocol's init family.
# 2. Kamani seed-0 tether EXTENSION (resume ep699 -> 1699): distinguishes
#    "escape is slow" from "escape is absent" for the recorded negative.
# 3. Burgers noise-robustness stretch (VERDICT r4 next-#8): shipped
#    config + noise_factor=20 (20% of data RMS), 60 epochs (clean-run
#    recovery resolved by ep ~39).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/kamani logs

COMMON="exp_bias=-0.55 pnet_zero=1 pnet_scale=100 lr=5e-6 l1=0.01"

harvest() {  # harvest <run_dir> <tag>
  [ -f "$1/final_params.json" ] && cp "$1/final_params.json" "artifacts/kamani/$2_final_params.json"
  last_fig=$(ls "$1"/fig_kamani_*.png 2>/dev/null | sort | tail -1)
  [ -n "${last_fig:-}" ] && cp "$last_fig" "artifacts/kamani/$2_$(basename "$last_fig")"
  grep -a "closed-loop" "$1"/log.txt 2>/dev/null > "artifacts/kamani/$2_closed_loop.txt" || true
  echo "[chainC] harvested $2 at $(date)"
}

echo "[chainC] === 1a. seed-2 stage 1 (corridor ep 0-199) at $(date) ==="
# shellcheck disable=SC2086
timeout 2400 python benchmarks/kamani_final.py r5s2 seed=2 $COMMON \
  exp_l2=0.0 epochs=200 plot_every=200
harvest logs/kamani_final_r5s2 r5_s2_ep199

echo "[chainC] === 1b. seed-2 stage 2 (tether ep 200-699) at $(date) ==="
# shellcheck disable=SC2086
timeout 3600 python benchmarks/kamani_final.py r5s2 seed=2 $COMMON \
  exp_l2=0.03 epochs=700 plot_every=250
harvest logs/kamani_final_r5s2 r5_s2_ep699

echo "[chainC] === 2. seed-0 tether extension (ep 700-1699) at $(date) ==="
# shellcheck disable=SC2086
timeout 4800 python benchmarks/kamani_final.py r5s0 seed=0 $COMMON \
  exp_l2=0.03 epochs=1700 plot_every=250
harvest logs/kamani_final_r5s0 r5_s0_ep1699

echo "[chainC] === 3. Burgers noise=20% (60 epochs, shipped config) at $(date) ==="
timeout 7200 python benchmarks/burgers_shipped.py 60 noise=20 tag=_noise20 \
  || echo "[chainC] burgers noise run failed (exit $?)"

echo "[chainC] chain complete at $(date)"

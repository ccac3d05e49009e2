#!/bin/bash
# Round-3 TPU queue, phase F (replaces phase E; runs unattended once the
# axon tunnel recovers).
#
# Kamani strategy upgrade over phase E: instead of committing 5000 TPU
# epochs to one deviation rung blind, run FOUR cheap 300-epoch probes
# (~10 min each once the graph is compile-cached), score them by the
# reference's own closed-loop trajectory criterion (benchmarks/
# kamani_pick.py parses the per-probe overlay logs), and spend the long
# run on the winner.  Rationale: the CPU exp-bias probe escapes the lazy
# basin but its coefficient growth is ~0.006/epoch — linear extrapolation
# reaches the O(100) true row only after ~17k epochs, so the corridor
# rungs (zero-init head + output gain, which multiply the same per-step
# net movement by 30-100x) may dominate within the 5000-epoch budget.
#
# Queue:
#   1. GL step decomposition (quality-grounded 30-iter budget + fused
#      Pallas smoother after the Mosaic roll/int32 rewrite).
#   2. Kamani probe battery (300 epochs each, plot_every=100).
#   3. Auto-pick -> FULL 5000-epoch Kamani run on the winner.
#   4. GL workload-config corners: second equation, ResNet transform.
#   5. bench.py with current defaults for a fresh headline number.
# Items bounded by their own timeouts so one hang cannot eat the queue.
set -u
cd "$(dirname "$0")/.."

# Single-CPU host: pause the CPU Kamani probes while TPU jobs need the
# host for dispatch.  Signal only if the pid is still a kamani_final run.
pause_cpu_probes() {
  for pid in 18378 18781; do
    if grep -aq kamani_final "/proc/$pid/cmdline" 2>/dev/null; then
      kill -"$1" "$pid" 2>/dev/null && echo "[chainF] sent SIG$1 to $pid"
    fi
  done
}

echo "[chainF] waiting for the axon tunnel to answer..."
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[chainF] tunnel still down at $(date); retrying in 120s"
  sleep 120
done
echo "[chainF] tunnel is up at $(date)"
pause_cpu_probes STOP

echo "[chainF] === 1. GL step decomposition (base b30 fused_b30 fused) ==="
# base is re-measured in the SAME session: tunnel timing drift between
# sessions reached 65% (VALIDATION.md), so cross-session A/B is invalid
timeout 9000 python benchmarks/gl_step_decomp.py base b30 fused_b30 fused

echo "[chainF] === 2. Kamani probe battery (300 epochs each) ==="
# p_expb first: it shares its compiled graph with the full run fallback
timeout 5400 python benchmarks/kamani_final.py p_expb seed=10 \
  exp_bias=-0.55 epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_expb_lr4x seed=10 \
  exp_bias=-0.55 lr=2e-5 epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_corridor seed=10 \
  exp_bias=-0.55 pnet_zero=1 pnet_scale=100 epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_corridor30 seed=10 \
  exp_bias=-0.55 pnet_zero=1 pnet_scale=30 epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_corridor_f50 seed=10 \
  exp_bias=-0.55 pnet_zero=1 pnet_scale=100 exp_freeze=50 \
  epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_l1w seed=10 \
  l1_warmup=150 epochs=300 plot_every=100

echo "[chainF] === 3. Auto-pick winner -> full 5000-epoch run ==="
FULL=$(python benchmarks/kamani_pick.py p_expb p_expb_lr4x p_corridor \
  p_corridor30 p_corridor_f50 p_l1w cpu_expb_s10 cpu_combo_s10 \
  cpu_corridor_s10 cpu_corridor_f50_s10)
echo "[chainF] full-run overrides: $FULL"
# shellcheck disable=SC2086  # intentional word-splitting of overrides
timeout 28800 python benchmarks/kamani_final.py full $FULL epochs=5000

echo "[chainF] === 4. bench.py (current defaults; also warms the driver's compile cache) ==="
timeout 7200 python bench.py

echo "[chainF] === 5a. GL second-equation run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py veq 150

echo "[chainF] === 5b. GL ResNet-transform run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py nnt 150

pause_cpu_probes CONT
echo "[chainF] DONE at $(date)"

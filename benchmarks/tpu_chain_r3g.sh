#!/bin/bash
# Round-3 TPU queue, phase G (replaces phase F; runs unattended once the
# axon tunnel recovers).
#
# Change vs phase F: the Kamani probe battery is demoted to informational.
# The CPU corridor probe (logs/kamani_final_cpu_corridor_s10, exp_bias
# -0.55 + zero-init head + output gain 100) already decided the pick: it
# is the FIRST configuration across 7+ init draws to break BELOW the 8.0
# lazy-plateau loss (7.93 @ epoch 152, sigma_t row alive at (0, 28, 30)
# vs true (0, 94, 27.9), junk p0 column decaying, closed-loop error
# improving).  With the tunnel down >12 h, TPU time may be too scarce for
# battery-then-full; spend it on the full 5000-epoch corridor run.
set -u
cd "$(dirname "$0")/.."

# Single-CPU host: pause the CPU Kamani probes while TPU jobs need the
# host for dispatch.  Signal only if the pid is still a kamani_final run.
pause_cpu_probes() {
  for pid in 18378 18781 21516 23391; do
    if grep -aq kamani_final "/proc/$pid/cmdline" 2>/dev/null; then
      kill -"$1" "$pid" 2>/dev/null && echo "[chainG] sent SIG$1 to $pid"
    fi
  done
}

echo "[chainG] waiting for the axon tunnel to answer..."
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[chainG] tunnel still down at $(date); retrying in 120s"
  sleep 120
done
echo "[chainG] tunnel is up at $(date)"
pause_cpu_probes STOP

echo "[chainG] === 1. GL step decomposition (base b30 fused_b30 fused) ==="
# base re-measured in the SAME session: tunnel drift between sessions
# reached 65% (VALIDATION.md), so cross-session A/B is invalid
timeout 9000 python benchmarks/gl_step_decomp.py base b30 fused_b30 fused

echo "[chainG] === 2. Kamani FULL corridor run (5000 epochs, babysat) ==="
timeout 28800 python benchmarks/kamani_final.py full seed=10 \
  exp_bias=-0.55 pnet_zero=1 pnet_scale=100 epochs=5000

echo "[chainG] === 3. bench.py (current defaults; warms the driver's cache) ==="
timeout 7200 python bench.py

echo "[chainG] === 4. informational Kamani probes (300 epochs each) ==="
timeout 5400 python benchmarks/kamani_final.py p_expb_lr4x seed=10 \
  exp_bias=-0.55 lr=2e-5 epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_corridor30 seed=10 \
  exp_bias=-0.55 pnet_zero=1 pnet_scale=30 epochs=300 plot_every=100
timeout 5400 python benchmarks/kamani_final.py p_l1w seed=10 \
  l1_warmup=150 epochs=300 plot_every=100

echo "[chainG] === 5a. GL second-equation run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py veq 150

echo "[chainG] === 5b. GL ResNet-transform run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py nnt 150

pause_cpu_probes CONT
echo "[chainG] DONE at $(date)"

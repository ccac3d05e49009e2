#!/bin/bash
# Round-3 TPU queue, phase E (replaces phase D; runs unattended once the
# axon tunnel recovers).  Priorities re-ordered after the CPU exp-bias
# probe showed a genuine lazy-basin escape (p1 row alive and growing,
# loss 85 -> <19 by epoch 93; logs/kamani_final_cpu_expb_s10):
#   1. GL step decomposition: quality-grounded 30-iter budget + the
#      Mosaic-compatible fused Pallas smoother (roll/int32 rewrite).
#   2. Kamani FULL-criterion run (5000 epochs) with exp_init_bias=-0.55,
#      seed 10 — the DOCUMENTED DEVIATION from the shipped init protocol
#      (which 7/7 init draws provably land lazy).  Babysitted: worker
#      faults auto-resume from the epoch-50-interval checkpoints.
#   3. GL workload-config corners: second equation, ResNet transform on.
#   4. Cheap secondary Kamani probes (L1 warmup, 4x lr) for the basin
#      study writeup — compile is cached by then.
#   5. bench.py with current defaults for a fresh headline number.
# Items are independent; each bounded by its own timeout so one hang
# cannot eat the queue.
set -u
cd "$(dirname "$0")/.."

# Single-CPU host: pause the CPU Kamani probes while TPU jobs need the
# host for dispatch.  Signal only if the pid is still a kamani_final run.
pause_cpu_probes() {
  for pid in 18378 18781; do
    if grep -aq kamani_final "/proc/$pid/cmdline" 2>/dev/null; then
      kill -"$1" "$pid" 2>/dev/null && echo "[chainE] sent SIG$1 to $pid"
    fi
  done
}

echo "[chainE] waiting for the axon tunnel to answer..."
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[chainE] tunnel still down at $(date); retrying in 120s"
  sleep 120
done
echo "[chainE] tunnel is up at $(date)"
pause_cpu_probes STOP

echo "[chainE] === 1. GL step decomposition (b30 fused_b30 fused) ==="
timeout 7200 python benchmarks/gl_step_decomp.py b30 fused_b30 fused

echo "[chainE] === 2. Kamani FULL exp-bias run seed 10 (5000 epochs) ==="
timeout 28800 python benchmarks/kamani_final.py expb_s10 seed=10 \
  exp_bias=-0.55 epochs=5000

echo "[chainE] === 3a. GL second-equation run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py veq 150

echo "[chainE] === 3b. GL ResNet-transform run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py nnt 150

echo "[chainE] === 4a. Kamani L1-warmup probe seed 10 (300 epochs) ==="
timeout 5400 python benchmarks/kamani_final.py l1w_s10 seed=10 \
  l1_warmup=150 epochs=300

echo "[chainE] === 4b. Kamani 4x-lr probe seed 10 (300 epochs) ==="
timeout 5400 python benchmarks/kamani_final.py lr4x_s10 seed=10 \
  lr=2e-5 epochs=300

echo "[chainE] === 5. bench.py (current defaults) ==="
timeout 7200 python bench.py

pause_cpu_probes CONT
echo "[chainE] DONE at $(date)"

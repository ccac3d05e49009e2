#!/bin/bash
# Round-3 TPU queue, phase D (runs unattended once the tunnel recovers):
#   1. GL step decomposition: quality-grounded 30-iter budget and the
#      Mosaic-compatible fused Pallas smoother (retest after the roll/int32
#      rewrite — previous attempt failed server-side on 64-bit types).
#   2. Kamani basin-escape probes, DOCUMENTED DEVIATIONS from the shipped
#      reference protocol (which 7/7 init draws prove lands lazy):
#      L1 warmup (mechanism-targeted: the L1 term is what pins the p1 row
#      at 0 once sensitivity drops) and 4x learning rate.
#   3. GL workload-config corners: second equation, ResNet transform on.
# Items are independent; each bounded by its own timeout so one hang
# cannot eat the queue.
set -u
cd "$(dirname "$0")/.."

echo "[chainD] waiting for the axon tunnel to answer..."
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[chainD] tunnel still down at $(date); retrying in 120s"
  sleep 120
done
echo "[chainD] tunnel is up at $(date)"

echo "[chainD] === GL step decomposition (b30 fused_b30 fused) ==="
timeout 7200 python benchmarks/gl_step_decomp.py b30 fused_b30 fused

echo "[chainD] === Kamani L1-warmup probe seed 10 (300 epochs) ==="
timeout 5400 python benchmarks/kamani_final.py l1w_s10 seed=10 \
  l1_warmup=150 epochs=300

echo "[chainD] === Kamani 4x-lr probe seed 10 (300 epochs) ==="
timeout 5400 python benchmarks/kamani_final.py lr4x_s10 seed=10 \
  lr=2e-5 epochs=300

echo "[chainD] === GL second-equation run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py veq 150

echo "[chainD] === GL ResNet-transform run (150 epochs) ==="
timeout 10800 python benchmarks/gl_stretch.py nnt 150

echo "[chainD] DONE at $(date)"

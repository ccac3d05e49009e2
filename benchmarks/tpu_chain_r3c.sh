#!/bin/bash
# Round-3 TPU queue, phase C: torch-init probes via the subprocess-isolated
# babysitter (kamani_final.py — fresh tunnel client per attempt, health
# probes, checkpoint/resume), then the GL step decomposition.
set -u
cd "$(dirname "$0")/.."

for s in 0 1 10; do
  echo "[chainC] === torch-init probe seed $s (300 epochs, babysat) ==="
  timeout 5400 python benchmarks/kamani_final.py "ti_s$s" "seed=$s" \
    torch_init=1 epochs=300
done

echo "[chainC] === GL step decomposition (base cheb5 it20 fused) ==="
timeout 7200 python benchmarks/gl_step_decomp.py base cheb5 it20 fused

echo "[chainC] DONE at $(date)"

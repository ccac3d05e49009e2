#!/bin/bash
# Round-3 TPU queue, phase B: finish the torch-init probe battery, then the
# GL step decomposition (incl. the fused Pallas smoother trial).
set -u
cd "$(dirname "$0")/.."

P=$(cat /tmp/probe_s0.pid 2>/dev/null || echo 0)
if [ "$P" -gt 0 ]; then
  echo "[chainB] waiting for torchinit_s0 probe pid $P"
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi

echo "[chainB] === probe torchinit_s1 ==="
timeout 4500 python benchmarks/kamani_probes.py torchinit_s1
echo "[chainB] === probe torchinit_s10 ==="
timeout 4500 python benchmarks/kamani_probes.py torchinit_s10
python benchmarks/kamani_probes.py --report || true

echo "[chainB] === GL step decomposition (base cheb5 it20 fused) ==="
timeout 7200 python benchmarks/gl_step_decomp.py base cheb5 it20 fused

echo "[chainB] DONE at $(date)"

#!/bin/bash
# Round-3 TPU job chain: waits for the Kamani babysitter (pid in
# /tmp/babysitter.pid) to finish, then runs the queued TPU jobs strictly
# serialized (the axon worker crashes under concurrent heavy load).
# Launch:  nohup bash benchmarks/tpu_chain_r3.sh > logs/chain_r3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

BPID=$(cat /tmp/babysitter.pid 2>/dev/null || echo 0)
if [ "$BPID" -gt 0 ]; then
  echo "[chain] waiting for kamani babysitter pid $BPID"
  while kill -0 "$BPID" 2>/dev/null; do sleep 60; done
fi
echo "[chain] kamani done at $(date); cooling 120s"
sleep 120

echo "[chain] === bf16 preconditioner GL step A/B ==="
timeout 3600 python benchmarks/gl_step_compare.py stencil stencil_bf16 stencil stencil_bf16

echo "[chain] === kamani torch-init probe battery (300 epochs each) ==="
timeout 4500 python benchmarks/kamani_probes.py torchinit_s0
timeout 4500 python benchmarks/kamani_probes.py torchinit_s1
timeout 4500 python benchmarks/kamani_probes.py torchinit_s10
python benchmarks/kamani_probes.py --report || true

echo "[chain] === GL second equation (veq, 500 epochs) ==="
timeout 14400 python benchmarks/gl_stretch.py veq 500

echo "[chain] === GL nn_transform (nnt, 150 epochs) ==="
timeout 14400 python benchmarks/gl_stretch.py nnt 150

echo "[chain] === bench refresh ==="
timeout 3600 python bench.py | tee BENCH_local_r3.json

echo "[chain] ALL DONE at $(date)"

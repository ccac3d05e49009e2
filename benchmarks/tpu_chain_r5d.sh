#!/bin/bash
# Round-5 session-3 TPU chain D (serialized; one TPU job at a time per
# CLAUDE.md).  Ordering: judge-demanded workload evidence first (chain C
# stages), then the perf probes, then a bench refresh so BENCH_CACHE
# carries an up-to-date b25c4rm measurement from this session.
#
# 1. Chain C: Kamani seed-2 second independent draw, seed-0 tether
#    extension (slow-vs-absent escape), Burgers noise=20% robustness.
# 2. Quality gate for b20c4rm: cheb4+4 @25 measured 1.249e-3 (chain B);
#    @20 must stay under the reference GS bar 3.1e-3 to be a candidate.
# 3. Full-step A/B b25c4rm (new production) vs b20c4rm, plus the
#    dispatch-bound bs64 scaling probe at production budgets.
# 4. bench.py refresh (headline + session health + cache).
set -u
cd "$(dirname "$0")/.."

echo "[chainD] === 1. chain C (workload evidence) at $(date) ==="
bash benchmarks/tpu_chain_r5c.sh 2>&1

echo "[chainD] === 2. smoother-budget gate 4:4:20 at $(date) ==="
timeout 1800 python benchmarks/smoother_budget_tpu.py 4:4:20 \
  || echo "[chainD] gate run failed (exit $?)"
sleep 20

echo "[chainD] === 3. A/B b25c4rm vs b20c4rm + bs64 probe at $(date) ==="
timeout 4500 python benchmarks/gl_step_decomp.py b25c4rm b20c4rm b25c4rm_bs64 \
  || echo "[chainD] A/B failed (exit $?)"
sleep 20

echo "[chainD] === 4. bench refresh at $(date) ==="
timeout 3600 python bench.py || echo "[chainD] bench failed (exit $?)"

echo "[chainD] chain complete at $(date)"

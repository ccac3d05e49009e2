#!/bin/bash
# Round-3 TPU queue, phase H (replaces phase G; chainG never saw the
# tunnel return during the >18h outage and its decomp list predated the
# fused-matvec variants).
#
# Changes vs phase G:
#   - Decomp variant list is read at runtime from
#     logs/chainH_decomp_variants.txt so the agent can add/remove the
#     mg_fused_matvec variants (fusedrm_b30/b30rm) once the CPU quality
#     A/B (benchmarks/fused_matvec_quality.py) says whether the bf16
#     inexact-Krylov matvec survives at the production budget.
#   - Marker-gated pause between the decomp and bench.py: the agent reads
#     the decomp output and flips bench.py's GL production config to the
#     winner, then `touch /tmp/chainH_go`.  Bounded at 45 min so an
#     unattended chain still secures a headline number.
set -u
cd "$(dirname "$0")/.."

# Single-core host: pause the CPU Kamani probes while TPU jobs need the
# host for dispatch.  Signal only if the pid is still a kamani_final run.
CPU_PROBE_PIDS="18378 18781 21516 23391 26237"
pause_cpu_probes() {
  for pid in $CPU_PROBE_PIDS; do
    if grep -aq kamani_final "/proc/$pid/cmdline" 2>/dev/null; then
      kill -"$1" "$pid" 2>/dev/null && echo "[chainH] sent SIG$1 to $pid"
    fi
  done
}

echo "[chainH] waiting for the axon tunnel to answer..."
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[chainH] tunnel still down at $(date); retrying in 120s"
  sleep 120
done
echo "[chainH] tunnel is up at $(date)"
pause_cpu_probes STOP

echo "[chainH] === 1. GL step decomposition (same-session base + variants) ==="
# base re-measured in the SAME session: tunnel timing drift between
# sessions reached 65% (VALIDATION.md), so cross-session A/B is invalid
VARS=$(cat logs/chainH_decomp_variants.txt 2>/dev/null \
       || echo "base b30 fused_b30 fusedr_b30 fusedrm_b30")
echo "[chainH] decomp variants: $VARS"
# shellcheck disable=SC2086  # intentional word-splitting of variant list
timeout 9000 python benchmarks/gl_step_decomp.py $VARS
touch /tmp/chainH_decomp_done
echo "[chainH] decomp done; waiting up to 45 min for /tmp/chainH_go"
echo "[chainH]   (agent: read decomp output above, flip bench.py GL config"
echo "[chainH]    to the winner if <= ~4s with quality parity, then"
echo "[chainH]    touch /tmp/chainH_go)"
for _ in $(seq 90); do
  [ -f /tmp/chainH_go ] && break
  sleep 30
done
echo "[chainH] proceeding to bench at $(date)"

echo "[chainH] === 2. bench.py (secure a headline number early) ==="
timeout 5400 python bench.py

echo "[chainH] === 3. Kamani pick (CPU probe evidence) -> full 5000-epoch run ==="
FULL=$(python benchmarks/kamani_pick.py cpu_expb_s10 cpu_combo_s10 \
  cpu_corridor_s10 cpu_corridor_f50_s10 cpu_corridor_rescue_s10)
echo "[chainH] full-run overrides: $FULL"
# shellcheck disable=SC2086  # intentional word-splitting of overrides
timeout 25200 python benchmarks/kamani_final.py full $FULL epochs=5000

echo "[chainH] === 4a. GL second-equation run (150 epochs) ==="
timeout 7200 python benchmarks/gl_stretch.py veq 150

echo "[chainH] === 4b. GL ResNet-transform run (150 epochs) ==="
timeout 7200 python benchmarks/gl_stretch.py nnt 150

pause_cpu_probes CONT
echo "[chainH] DONE at $(date)"

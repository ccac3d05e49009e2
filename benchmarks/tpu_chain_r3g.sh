#!/bin/bash
# Round-3 TPU queue, phase G (replaces phase F after the >13h tunnel
# outage; chainF died with its session before the tunnel returned).
#
# Changes vs phase F:
#   - The TPU 300-epoch probe battery is DROPPED: the CPU corridor probes
#     (logs/kamani_final_cpu_*_s10) have accumulated deeper evidence than
#     any 300-epoch TPU probe would (corridor: p1 row at (0.2, 30, 32)
#     heading to the true (0, 94, 27.9) by epoch ~220, closed-loop err
#     falling 0.68 -> 0.53), and basin dynamics reproduce across
#     platforms (VALIDATION.md).  kamani_pick.py scores the CPU logs.
#   - bench.py moved BEFORE the 5000-epoch Kamani run: with the tunnel
#     down >13h, securing a same-session headline number early beats
#     risking the whole window on one long run.
#   - GL config flip (fused_b30 defaults in bench.py) is NOT automated:
#     the agent reads the decomp output and applies it by hand.
set -u
cd "$(dirname "$0")/.."

# Single-core host: pause the CPU Kamani probes while TPU jobs need the
# host for dispatch.  Signal only if the pid is still a kamani_final run.
CPU_PROBE_PIDS="18378 18781 21516 23391 26237"
pause_cpu_probes() {
  for pid in $CPU_PROBE_PIDS; do
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
# base re-measured in the SAME session: tunnel timing drift between
# sessions reached 65% (VALIDATION.md), so cross-session A/B is invalid
timeout 9000 python benchmarks/gl_step_decomp.py base b30 fused_b30 fusedr_b30 b30r

echo "[chainG] === 2. bench.py (secure a headline number early) ==="
timeout 5400 python bench.py

echo "[chainG] === 3. Kamani pick (CPU probe evidence) -> full 5000-epoch run ==="
FULL=$(python benchmarks/kamani_pick.py cpu_expb_s10 cpu_combo_s10 \
  cpu_corridor_s10 cpu_corridor_f50_s10 cpu_corridor_rescue_s10)
echo "[chainG] full-run overrides: $FULL"
# shellcheck disable=SC2086  # intentional word-splitting of overrides
timeout 25200 python benchmarks/kamani_final.py full $FULL epochs=5000

echo "[chainG] === 4a. GL second-equation run (150 epochs) ==="
timeout 7200 python benchmarks/gl_stretch.py veq 150

echo "[chainG] === 4b. GL ResNet-transform run (150 epochs) ==="
timeout 7200 python benchmarks/gl_stretch.py nnt 150

pause_cpu_probes CONT
echo "[chainG] DONE at $(date)"

#!/bin/bash
# Round-5 session-2 TPU chain (serialized; one TPU job at a time per
# CLAUDE.md).  Stages are measurement-only — no config decisions baked in.
#
# 1. Finish the seed-10 protocol-length Kamani run: session-1's stage 2
#    was killed by its own 9600 s timeout at ep ~2749 (ckpt 2749 exists);
#    resume and run the final 250 epochs so the TRUE ep-2999 final_params
#    + closed-loop sweep get written (VERDICT r4 next-#5).
# 2. Per-session Mosaic retry of the fused Pallas smoother (VERDICT r4
#    next-1c).  Short leash: the failure mode is a server-side compile
#    hang, not a fast error.
# 3. Quality gate for the b25c4rm candidate: cheb4+4 @25 forward relres
#    must beat the reference GS bar 3.1e-3 (see gl_step_decomp.py note).
# 4. Full-step same-session A/B b30c4rm (production) vs b25c4rm.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/kamani logs

harvest() {  # harvest <run_dir> <tag>
  [ -f "$1/final_params.json" ] && cp "$1/final_params.json" "artifacts/kamani/$2_final_params.json"
  last_fig=$(ls "$1"/fig_kamani_*.png 2>/dev/null | sort | tail -1)
  [ -n "${last_fig:-}" ] && cp "$last_fig" "artifacts/kamani/$2_$(basename "$last_fig")"
  grep -a "closed-loop" "$1"/log.txt 2>/dev/null > "artifacts/kamani/$2_closed_loop.txt" || true
  echo "[chainB] harvested $2 at $(date)"
}

echo "[chainB] === 1. seed-10 finish ep2750-2999 at $(date) ==="
timeout 3000 python benchmarks/kamani_final.py r5full seed=10 \
  exp_bias=-0.55 pnet_zero=1 pnet_scale=100 lr=5e-6 l1=0.01 \
  exp_l2=0.03 epochs=3000 plot_every=250
harvest logs/kamani_final_r5full r5_s10_ep2999

echo "[chainB] === 2. Mosaic fused-smoother retry at $(date) ==="
timeout 900 python benchmarks/gl_step_decomp.py fusedwrm_b30 \
  || echo "[chainB] fused smoother still blocked (exit $?)"
sleep 30

echo "[chainB] === 3. smoother-budget gate 4:4:25 at $(date) ==="
timeout 1800 python benchmarks/smoother_budget_tpu.py 4:4:25 \
  || echo "[chainB] gate run failed (exit $?)"

echo "[chainB] === 4. full-step A/B b30c4rm vs b25c4rm at $(date) ==="
timeout 3600 python benchmarks/gl_step_decomp.py b30c4rm b25c4rm \
  || echo "[chainB] A/B failed (exit $?)"

echo "[chainB] chain complete at $(date)"

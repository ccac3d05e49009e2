"""Verify the bf16-binv collapse mechanism and the factored-storage fix.

bf16_collapse_diag.py isolated the collapse to the bf16-stored explicit
line-block inverses.  Hypothesis: entrywise rounding of an ill-conditioned
SPD inverse makes it INDEFINITE (lambda_min < 0), and Chebyshev smoothing
amplifies the negative modes exponentially.  Fix: store the inverse
Cholesky factor W (B^-1 = W W^T) in bf16 — the applied preconditioner
round(W) round(W)^T is PSD by construction, degrading gracefully
(~sqrt(cond) error amplification instead of cond).

Checks, on the GL-shaped (8,32,32) n_grid-3 system:
  1. eigvalsh of the fine-level blocks' bf16-rounded inverses: count
     negative eigenvalues (vs f32: none).
  2. FGMRES quality with binv replaced by the PSD emulation
     round_bf16(W) @ round_bf16(W)^T (computed in f32): if this restores
     usable quality, the factored storage is the production fix.

Usage: python benchmarks/bf16_factor_diag.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from benchmarks.bf16_collapse_diag import build, relres


def main():
    layer32, vals, rhs_vec, hier32 = build("f32")
    layer16, _, _, hier16 = build("bf16")

    # 1. definiteness of the rounded inverses (fine level)
    binv32 = np.asarray(hier32["levels"][0]["binv"][0], np.float64)
    binv16 = np.asarray(
        hier16["levels"][0]["binv"][0].astype(jnp.float32), np.float64)
    ev32 = np.linalg.eigvalsh(binv32)
    ev16 = np.linalg.eigvalsh(0.5 * (binv16 + np.swapaxes(binv16, -1, -2)))
    print(f"fine-level blocks: {binv32.shape[0]} of size {binv32.shape[1]}")
    print(f"  f32  inverse: min eig {ev32.min():.3e}, "
          f"negatives {(ev32 < 0).sum()}")
    print(f"  bf16 inverse: min eig {ev16.min():.3e}, "
          f"negatives {(ev16 < 0).sum()} "
          f"(blocks w/ any negative: {(ev16.min(axis=-1) < 0).sum()})")
    cond = ev32.max(axis=-1) / np.maximum(ev32.min(axis=-1), 1e-300)
    print(f"  f32 inverse block cond: median {np.median(cond):.2e}, "
          f"max {cond.max():.2e}", flush=True)

    # 2. PSD factored emulation: W = chol(B^-1); store round_bf16(W)
    def factored_emulation(binv):
        b64 = binv.astype(jnp.float64)
        b64 = 0.5 * (b64 + jnp.swapaxes(b64, -1, -2))
        # f32-computed inverses can be microscopically indefinite in f64;
        # a relative ridge keeps the emulation's Cholesky finite
        d = jnp.diagonal(b64, axis1=-2, axis2=-1).max(-1)
        b64 = b64 + (1e-9 * d)[..., None, None] * jnp.eye(
            b64.shape[-1], dtype=b64.dtype)
        W = jnp.linalg.cholesky(b64)
        W16 = W.astype(jnp.bfloat16).astype(jnp.float64)
        return jnp.einsum("...ij,...kj->...ik", W16, W16)

    h = {"levels": [dict(l) for l in hier16["levels"]],
         "coarse_inv": hier16["coarse_inv"]}
    for k, lvl in enumerate(h["levels"]):
        emul = jax.vmap(factored_emulation)(hier32["levels"][k]["binv"])
        lvl["binv"] = emul.astype(jnp.float32)
        # re-estimate lmax on the emulated preconditioner (the production
        # path estimates lmax on whatever operator it stores)
        lvl["lmax"] = layer16.mg_solver._estimate_lmax(k, lvl)
        print(f"  level {k}: lmax f32 {float(hier32['levels'][k]['lmax'][0]):.3e}"
              f" -> factored-bf16 {float(lvl['lmax'][0]):.3e}", flush=True)

    x, iters, _ = layer16.mg_solver.solve_normal(vals, rhs_vec, h)
    rr = relres(layer32, vals, rhs_vec, x)
    print(f"bf16-FACTORED binv (coef+coarse still bf16): relres {rr:.3e} "
          f"(iters {int(np.asarray(iters).max())})")

    x, iters, _ = layer32.mg_solver.solve_normal(vals, rhs_vec, hier32)
    print(f"f32 control: relres {relres(layer32, vals, rhs_vec, x):.3e}")


if __name__ == "__main__":
    main()

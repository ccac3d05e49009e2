"""Mixed-precision hierarchy storage: can a bf16 binv variant pass the gate?

bf16_attrib_diag.py showed the earlier factored-bf16 number (1.0e-2) was
CONFOUNDED: that run kept coef+coarse in bf16, and coef-bf16 alone costs
9.9e-3.  This script starts from the ALL-f32 hierarchy and degrades ONLY
binv, measuring each storage candidate in isolation:

  a. binv bf16 (entrywise rounding of the explicit inverse)
  b. binv factored-bf16: B^-1 ~ round(W) round(W)^T with W = chol(B^-1)
     — PSD by construction
  c. binv equilibrated-bf16: D^1/2 round(D^-1/2 binv D^-1/2) D^1/2 with
     D = diag(binv) stored f32 (unit-diagonal matrix rounds better if the
     conditioning is scale-dominated)
  d. b+c combined: equilibrate, then factor, round the factor

VMEM relevance: the fused Pallas smoother (ops/fused_smoother.py) needs
the GL fine level under ~16 MB/core.  coef f32 (4.3 MB) + binv
factored-bf16 (6.4 MB) fits; all-f32 (17 MB) does not.  Gate: within 3x
of the f32 control (the fused_matvec_quality.py standard).

lmax is re-estimated on each candidate operator, as production would.

Usage: python benchmarks/bf16_mixed_diag.py
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


def _sym(b):
    return 0.5 * (b + jnp.swapaxes(b, -1, -2))


def _ridge(b64):
    d = jnp.diagonal(b64, axis1=-2, axis2=-1).max(-1)
    eye = jnp.eye(b64.shape[-1], dtype=b64.dtype)
    return b64 + (1e-9 * d)[..., None, None] * eye


def cand_bf16(binv):
    return binv.astype(jnp.bfloat16).astype(jnp.float32)


def cand_factored(binv):
    W = jnp.linalg.cholesky(_ridge(_sym(binv.astype(jnp.float64))))
    W16 = W.astype(jnp.bfloat16).astype(jnp.float64)
    return jnp.einsum("...ij,...kj->...ik", W16, W16).astype(jnp.float32)


def cand_equil(binv):
    b64 = _sym(binv.astype(jnp.float64))
    d = jnp.diagonal(b64, axis1=-2, axis2=-1)
    s = 1.0 / jnp.sqrt(d)
    unit = b64 * s[..., :, None] * s[..., None, :]
    u16 = unit.astype(jnp.bfloat16).astype(jnp.float64)
    return (u16 / (s[..., :, None] * s[..., None, :])).astype(jnp.float32)


def cand_equil_factored(binv):
    b64 = _sym(binv.astype(jnp.float64))
    d = jnp.diagonal(b64, axis1=-2, axis2=-1)
    s = 1.0 / jnp.sqrt(d)
    unit = _ridge(b64 * s[..., :, None] * s[..., None, :])
    W = jnp.linalg.cholesky(unit)
    W16 = W.astype(jnp.bfloat16).astype(jnp.float64)
    u16 = jnp.einsum("...ij,...kj->...ik", W16, W16)
    return (u16 / (s[..., :, None] * s[..., None, :])).astype(jnp.float32)


def main():
    layer32, vals, rhs_vec, hier32 = build("f32")

    x, iters, _ = layer32.mg_solver.solve_normal(vals, rhs_vec, hier32)
    base = relres(layer32, vals, rhs_vec, x)
    print(f"f32 control: relres {base:.3e} "
          f"(iters {int(np.asarray(iters).max())})", flush=True)

    for name, fn in [("binv bf16", cand_bf16),
                     ("binv factored-bf16", cand_factored),
                     ("binv equilibrated-bf16", cand_equil),
                     ("binv equil+factored-bf16", cand_equil_factored)]:
        h = {"levels": [dict(l) for l in hier32["levels"]],
             "coarse_inv": hier32["coarse_inv"]}
        for k, lvl in enumerate(h["levels"]):
            lvl["binv"] = jax.vmap(fn)(hier32["levels"][k]["binv"])
            lvl["lmax"] = layer32.mg_solver._estimate_lmax(k, lvl)
        x, iters, _ = layer32.mg_solver.solve_normal(vals, rhs_vec, h)
        rr = relres(layer32, vals, rhs_vec, x)
        verdict = "PASS" if rr <= 3 * base else "fail"
        print(f"{name} (coef/coarse f32): relres {rr:.3e} "
              f"(iters {int(np.asarray(iters).max())})  [{verdict}]",
              flush=True)


if __name__ == "__main__":
    main()

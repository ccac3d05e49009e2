"""Attribute the non-binv bf16 quality cost: coef vs coarse_inv.

bf16_collapse_diag found binv-bf16 = collapse (indefinite inverses) and
[binv f32, coef bf16, coarse bf16] = 6.2e-3 (vs f32 4.0e-4).  This run
splits that residual cost between the stencil coef field and the coarsest
inverse, deciding the fused-smoother storage policy under the ~16 MB VMEM
budget (binv f32 12.8 MB + coef f32 4.3 MB does not fit; binv f32 + coef
bf16 ≈ 15 MB does).

Usage: python benchmarks/bf16_attrib_diag.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.bf16_collapse_diag import build, relres


def main():
    layer32, vals, rhs_vec, hier32 = build("f32")
    layer16, _, _, hier16 = build("bf16")

    def cell(name, use16):
        h = {"levels": [], "coarse_inv": (hier16 if "coarse" in use16 else
                                          hier32)["coarse_inv"]}
        for k in range(len(hier32["levels"])):
            lvl = dict(hier32["levels"][k])
            if "coef" in use16 and "coef" in lvl:
                lvl["coef"] = hier16["levels"][k]["coef"]
                # lmax must be estimated on the operator actually applied
                lvl["lmax"] = layer16.mg_solver._estimate_lmax(k, lvl)
            h["levels"].append(lvl)
        x, iters, _ = layer32.mg_solver.solve_normal(vals, rhs_vec, h)
        rr = relres(layer32, vals, rhs_vec, x)
        print(f"{name}: relres {rr:.3e} (iters {int(np.asarray(iters).max())})",
              flush=True)

    cell("coef bf16 only (binv+coarse f32)", {"coef"})
    cell("coarse_inv bf16 only (binv+coef f32)", {"coarse"})
    cell("coef+coarse bf16 (binv f32)", {"coef", "coarse"})


if __name__ == "__main__":
    main()

"""Ablate WHICH bf16-stored component collapses the GL-shaped solve.

fused_matvec_quality.py measured mg_precond_dtype='bf16' at relres 0.998
@30 iters on the GL-shaped (8,32,32) n_grid-3 production-precision case —
total preconditioner failure, far beyond the 17-33% quality cost measured
earlier on the (6,12,12) f64-outer case (VALIDATION.md).  The stored-bf16
leaves are: per-level `coef` (assembled AtA stencil), per-level `binv`
(line-block inverses), and `coarse_inv`; `lmax` is estimated ON the stored
operator.  This script builds f32 and bf16 hierarchies for the same system
and solves with hybrids that restore one leaf at a time to f32.

Usage: python benchmarks/bf16_collapse_diag.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer
from mech_nn_discovery_pde_tpu.ops.structured import split_values

BUDGET = dict(mg_smoother_steps_pre=7, mg_smoother_steps_post=7,
              mg_fgmres_max_iter_forward=30, mg_fgmres_max_iter_backward=30)


def build(pdtype):
    bs, dims = 1, (8, 32, 32)
    ivs = [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
        lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
    ]
    layer = MultigridLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=ivs, solver_dbl=True, n_grid=3,
        downsample_first=False,
        config=PDEConfig(precision="f32_ir", mg_solve_dtype="f32",
                         mg_precond_dtype=pdtype, **BUDGET),
    )
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 0] = -1.0
    coeffs[..., 1] = 1.0
    coeffs[..., 5] = -1.0
    coeffs[..., 6] = -1.0
    rhs = 0.01 * rng.standard_normal((bs, layer.grid_size))
    iv = 0.1 * rng.standard_normal((bs, layer.system.n_init_rows))
    steps = [jnp.asarray(np.full((bs, d - 1), 0.1)) for d in dims]
    vals, rhs_vec, hier = layer._prepare(
        jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv), steps)
    return layer, vals, rhs_vec, hier


def relres(layer, vals, rhs_vec, x):
    sys0 = layer.system
    sv = jax.vmap(lambda v: split_values(sys0.spec, v.astype(jnp.float64)))(vals)
    mv, rmv = layer.mg_solver._sops[0]
    # atb and residual through the f64 factored ops
    atb = jax.vmap(lambda s, b: rmv(s, b))(sv, rhs_vec.astype(jnp.float64))
    ax = jax.vmap(lambda s, v: rmv(s, mv(s, v)))(sv, x.astype(jnp.float64))
    return float(jnp.linalg.norm(atb - ax) / jnp.linalg.norm(atb))


def main():
    layer32, vals, rhs_vec, hier32 = build("f32")
    layer16, _, _, hier16 = build("bf16")
    for k in range(len(hier32["levels"])):
        l32, l16 = float(hier32["levels"][k]["lmax"][0]), float(
            hier16["levels"][k]["lmax"][0])
        print(f"level {k}: lmax f32 {l32:.4e}  bf16 {l16:.4e}  "
              f"ratio {l16 / l32:.3f}", flush=True)

    def hybrid(name, **swap):
        h = jax.tree_util.tree_map(lambda x: x, hier16)  # shallow copy tree
        h = {"levels": [dict(l) for l in hier16["levels"]],
             "coarse_inv": hier16["coarse_inv"]}
        if swap.get("coarse"):
            h["coarse_inv"] = hier32["coarse_inv"]
        for k, lvl in enumerate(h["levels"]):
            if swap.get("coef") and "coef" in lvl:
                lvl["coef"] = hier32["levels"][k]["coef"]
            if swap.get("binv"):
                lvl["binv"] = hier32["levels"][k]["binv"]
            if swap.get("lmax"):
                lvl["lmax"] = hier32["levels"][k]["lmax"]
        x, iters, rnorm = layer16.mg_solver.solve_normal(vals, rhs_vec, h)
        rr = relres(layer32, vals, rhs_vec, x)
        print(f"{name}: relres {rr:.3e} (iters {int(np.asarray(iters).max())})",
              flush=True)

    x, iters, _ = layer32.mg_solver.solve_normal(vals, rhs_vec, hier32)
    print(f"f32 control: relres {relres(layer32, vals, rhs_vec, x):.3e} "
          f"(iters {int(np.asarray(iters).max())})", flush=True)
    hybrid("bf16 control")
    hybrid("bf16 + coarse_inv f32", coarse=True)
    hybrid("bf16 + coef f32", coef=True)
    hybrid("bf16 + binv f32", binv=True)
    hybrid("bf16 + lmax from f32 build", lmax=True)


if __name__ == "__main__":
    main()

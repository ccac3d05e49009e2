"""Quality A/B for the round-3 V-cycle fusions (CPU, production dtypes).

Question: mg_smoother_residual reuses the Chebyshev invariant r = b - A x
as the restriction input, and mg_fused_matvec hands FGMRES (z, A z) with
A z reconstructed from the post-smoother's residual invariant
(solvers/multigrid.py:precondition_with_Az).  With mg_precond_dtype='bf16'
the reconstructed A z comes from the bf16-STORED operator, i.e. FGMRES
becomes an inexact-Krylov method with ~4e-3 relative matvec error.  Before
spending tunnel hours on the timing A/B (benchmarks/gl_step_decomp.py
b30r/b30rm/fusedr_b30/fusedrm_b30), verify on CPU that solve quality at the
production budget survives each fusion.

Runs the GL-shaped (8,32,32) n_grid-3 system with the production precision
(f32_ir, f32 solve dtype) and prints the forward FGMRES relative residual
for: b30 (baseline), b30r, b30rm, b30_bf16, b30rm_bf16.

Admissibility bar: the reference's own GS V-cycle anchor is 3.1e-3 relres
@40 iters (benchmarks/budget_quality.py); anything <= ~2e-3 @30 beats it.

Usage: python benchmarks/fused_matvec_quality.py
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

BUDGET = dict(mg_smoother_steps_pre=7, mg_smoother_steps_post=7,
              mg_fgmres_max_iter_forward=30, mg_fgmres_max_iter_backward=30)

VARIANTS = {
    "b30": {},
    "b30r": dict(mg_smoother_residual=True),
    "b30rm": dict(mg_smoother_residual=True, mg_fused_matvec=True),
    "b30_bf16": dict(mg_precond_dtype="bf16"),
    "b30rm_bf16": dict(mg_smoother_residual=True, mg_fused_matvec=True,
                       mg_precond_dtype="bf16"),
}


def run(name):
    over = dict(BUDGET, **VARIANTS[name])
    bs, dims = 2, (8, 32, 32)
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
        config=PDEConfig(precision="f32_ir", mg_solve_dtype="f32", **over),
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
    st = layer.solve_stats(jnp.asarray(coeffs), jnp.asarray(rhs),
                           jnp.asarray(iv), steps)
    rr = float(np.asarray(st["rel_rnorm"]).max())
    it = int(np.asarray(st["iters"]).max())
    print(f"{name}: fwd relres {rr:.3e} (iters {it})", flush=True)
    return rr


def main():
    names = sys.argv[1:] or list(VARIANTS)
    base = None
    for n in names:
        rr = run(n)
        if n == "b30":
            base = rr
    if base is not None:
        print(f"baseline b30 relres {base:.3e}; variants within 3x pass",
              flush=True)


if __name__ == "__main__":
    main()

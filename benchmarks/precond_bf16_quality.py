"""Quality A/B of mg_precond_dtype = f32 vs bf16 (CPU, f64 outer solve).

FGMRES is flexible: a lower-precision preconditioner perturbs search
directions, not the fine-level operator/residual, so the question is only
how much converged quality it costs at the reference's 40-iteration budget.
Run on the GL-shaped 3D case (the quality-guard shape, larger budget) and
2D transport.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer


def gl_case(bs=1, dims=(6, 12, 12), n_grid=2):
    ivs = [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
        lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
    ]
    rng = np.random.default_rng(0)

    def make(cfg):
        return MultigridLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1,
                              n_iv=1, init_index_mi_list=ivs, solver_dbl=True,
                              n_grid=n_grid, downsample_first=False, config=cfg)

    probe = make(PDEConfig(precision="f64"))
    gs = probe.grid_size
    coeffs = np.zeros((bs, gs, probe.n_orders))
    coeffs[..., 0] = 0.4 + 0.2 * rng.standard_normal((bs, gs))
    coeffs[..., 1] = 1.0
    coeffs[..., 5] = -0.1
    coeffs[..., 6] = -0.1
    rhs = 0.1 * rng.standard_normal((bs, gs))
    iv = 0.1 * rng.standard_normal((bs, probe.system.n_init_rows))
    steps = [np.full((bs, d - 1), 0.05) for d in dims]
    args = tuple(jnp.asarray(a) for a in (coeffs, rhs, iv)) + (
        [jnp.asarray(s) for s in steps],)
    return make, args


def transport_case(bs=1, dims=(32, 32), n_grid=3):
    ivs = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
        lambda nx, ny: (1, 0, [0, ny - 1], [nx - 1, ny - 1]),
    ]
    rng = np.random.default_rng(0)

    def make(cfg):
        return MultigridLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1,
                              n_iv=1, init_index_mi_list=ivs, solver_dbl=True,
                              n_grid=n_grid, downsample_first=True, config=cfg)

    probe = make(PDEConfig(precision="f64"))
    gs = probe.grid_size
    coeffs = np.zeros((bs, gs, probe.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 0.5
    rhs = 0.1 * rng.standard_normal((bs, gs))
    iv = 0.1 * rng.standard_normal((bs, probe.system.n_init_rows))
    steps = [np.full((bs, d - 1), 0.05) for d in dims]
    args = tuple(jnp.asarray(a) for a in (coeffs, rhs, iv)) + (
        [jnp.asarray(s) for s in steps],)
    return make, args


def run(name, make, args, iters):
    for pdt in ("f32", "bf16"):
        cfg = PDEConfig(precision="f64", mg_precond_dtype=pdt,
                        mg_fgmres_max_iter_forward=iters,
                        mg_fgmres_restarts_forward=10)
        layer = make(cfg)
        st = jax.jit(lambda c, r, i: layer.solve_stats(c, r, i, args[3]))(
            *args[:3])
        rel = float(np.asarray(st["rel_rnorm"]).max())
        it = int(np.asarray(st["iters"]).max())
        print(f"{name:12s} iters<={iters:3d} precond={pdt:5s} "
              f"rel_rnorm={rel:.3e} used_iters={it}", flush=True)


if __name__ == "__main__":
    make, args = gl_case()
    run("gl_small", make, args, 40)
    make, args = transport_case()
    run("transport2d", make, args, 40)

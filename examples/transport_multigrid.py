import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))  # noqa: E402
"""Transport on a large (8, 512) grid via the multigrid-FGMRES path.

Port of reference examples/2. sparse_multigrid_solver_transport.ipynb:
n_grid=6 hierarchy (512 -> 16 in space), runtime config overrides (cell 18),
autoregressive time marching.

Run:  python examples/transport_multigrid.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer


def main():
    bs = 5
    coord_dims = (8, 512)
    n_grid = 6
    iv_list = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]

    # runtime config overrides (reference notebook cell 18 mutates PDEConfig)
    cfg = PDEConfig(mg_fgmres_restarts_forward=20, mg_fgmres_restarts_backward=20)

    pde = MultigridLayer(
        bs=bs, coord_dims=coord_dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, solver_dbl=True, n_grid=n_grid,
        downsample_first=False, config=cfg,
    )

    t_step = 0.005
    x_step = 2 * np.pi / coord_dims[1]
    steps = [
        jnp.full((bs, coord_dims[0] - 1), t_step),
        jnp.full((bs, coord_dims[1] - 1), np.clip(x_step, 1e-3, 0.1)),
    ]
    coeffs = jnp.zeros((bs, pde.grid_size, pde.n_orders))
    coeffs = coeffs.at[..., 1].set(1.0).at[..., 2].set(1.0)
    rhs = jnp.zeros((bs, pde.grid_size))
    x = jnp.linspace(0, 2 * np.pi, coord_dims[1])
    iv_rhs = jnp.stack([jnp.sin((i + 1) * x) for i in range(bs)], axis=0)

    solve = jax.jit(lambda c, r, i, s: pde(c, r, i, s)[0])
    u_list = []
    for i in range(4):
        u0 = solve(coeffs, rhs, iv_rhs, steps).reshape(bs, *coord_dims)
        iv_rhs = u0[:, -1]
        u_list.append(np.asarray(u0))
    u = np.concatenate(u_list, axis=1)
    total_t = u.shape[1] * t_step
    expect = np.sin(np.asarray(x) - total_t)
    err = np.abs(u[0, -1] - expect)[8:-8].max()
    print("marched solution shape:", u.shape)
    print(f"interior advection error: {err:.3e}")
    return u


if __name__ == "__main__":
    main()

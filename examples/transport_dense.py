import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))  # noqa: E402
"""Transport equation solved with the dense PDE layer, marching in time.

Port of reference examples/1. dense_solver_transport.ipynb: solve
u_t + u_x = 0 on (8, 64) windows with u(0, x) = sin(k x) initial values, then
march forward by re-seeding each window's initial values from the previous
window's last time slice (cell 17) — the forward-simulation API pattern.

Run:  python examples/transport_dense.py  [--plot]
"""

import sys

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer


def main(plot: bool = False):
    bs = 5
    coord_dims = (8, 64)
    iv_list = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]

    pde = PDEDenseLayer(
        bs=bs, coord_dims=coord_dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, n_iv_steps=1, double_ret=True, solver_dbl=True,
    )

    t_step = 0.005
    x_step = 2 * np.pi / coord_dims[1]
    steps = [
        jnp.full((bs, coord_dims[0] - 1), np.clip(t_step, 1e-3, 0.1)),
        jnp.full((bs, coord_dims[1] - 1), np.clip(x_step, 1e-3, 0.1)),
    ]

    # u_t + u_x = 0
    coeffs = jnp.zeros((bs, pde.grid_size, pde.n_orders))
    coeffs = coeffs.at[..., 1].set(1.0).at[..., 2].set(1.0)
    rhs = jnp.zeros((bs, pde.grid_size))

    x = jnp.linspace(0, 2 * np.pi, coord_dims[1])
    iv_rhs = jnp.stack([jnp.sin((i + 1) / 2 * x) for i in range(bs)], axis=0)

    solve = jax.jit(lambda c, r, i, s: pde(c, r, i, s)[0])
    u_list = []
    for i in range(8):
        u0 = solve(coeffs, rhs, iv_rhs, steps).reshape(bs, *coord_dims)
        iv_rhs = u0[:, -1]  # seed next window from the last time slice
        u_list.append(np.asarray(u0))
    u = np.concatenate(u_list, axis=1)
    print("marched solution shape:", u.shape)
    total_t = u.shape[1] * t_step
    expect = np.sin(1 / 2 * (np.asarray(x) - total_t))
    err = np.abs(u[0, -1] - expect).max()
    print(f"advection error after {u.shape[1]} marched steps (k=1/2): {err:.3e}")

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        f, axs = plt.subplots(bs, figsize=(8, 10))
        for i in range(bs):
            axs[i].pcolormesh(u[i], cmap="viridis", shading="gouraud")
        f.savefig("transport_dense.png", dpi=120)
        print("wrote transport_dense.png")
    return u


if __name__ == "__main__":
    main(plot="--plot" in sys.argv)

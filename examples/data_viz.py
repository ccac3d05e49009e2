import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))  # noqa: E402
"""Dataset visualization (port of reference examples/pde_data.ipynb):
renders the generated Burgers / Ginzburg-Landau / Kamani / sine datasets.

Run:  python examples/data_viz.py          # writes dataset_viz.png
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from mech_nn_discovery_pde_tpu.data import generate


def main(out="dataset_viz.png", fast=True):
    fig, axs = plt.subplots(2, 2, figsize=(12, 9))

    u = generate.burgers(nt=64 if fast else 128)
    im = axs[0, 0].pcolormesh(u, cmap="RdBu_r", shading="gouraud")
    axs[0, 0].set_title("viscous Burgers u(t, x)")
    axs[0, 0].set_xlabel("x")
    axs[0, 0].set_ylabel("t")
    fig.colorbar(im, ax=axs[0, 0])

    ut, t = generate.kamani(n_t=400, n_amp=8)
    for j in range(0, 8, 2):
        axs[0, 1].plot(t, ut[:, j], label=f"amp idx {j}")
    axs[0, 1].set_title("Kamani stress trajectories")
    axs[0, 1].set_xlabel("t")
    axs[0, 1].legend(fontsize=7)

    A = generate.ginzburg_landau(nt=4, nx=64, ny=64, skip=10.0 if fast else 20.0)
    im = axs[1, 0].pcolormesh(A[-1].real, cmap="RdBu_r", shading="gouraud")
    axs[1, 0].set_title("Ginzburg-Landau Re A(x, y)")
    fig.colorbar(im, ax=axs[1, 0])

    y = generate.damped_sine()
    im = axs[1, 1].pcolormesh(y, cmap="viridis", shading="gouraud")
    axs[1, 1].set_title("damped sine fit target")
    fig.colorbar(im, ax=axs[1, 1])

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

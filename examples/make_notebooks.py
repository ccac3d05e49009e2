"""Generate the example notebooks from the example scripts.

The reference ships four notebooks (examples/*.ipynb); this repo's examples
are scripts first (runnable in CI), with notebooks generated from them so
notebook users get the same interactive entry points.  Each notebook has a
markdown header plus the script body split at top-level function/section
boundaries into executable cells, ending with a cell that runs main().

Run:  python examples/make_notebooks.py
"""

import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))

NOTEBOOKS = {
    # our script -> (notebook name, markdown header)  [reference parity:
    # examples/1. dense_solver_transport.ipynb etc.]
    "transport_dense.py": (
        "1_dense_solver_transport.ipynb",
        "# Transport equation — dense direct PDE layer\n\n"
        "Solve $u_t + u_x = 0$ on (8, 64) windows and march in time by "
        "re-seeding each window's initial values from the previous window's "
        "last solved slice (the forward-simulation API pattern; reference "
        "notebook 1, cell 17).",
    ),
    "transport_multigrid.py": (
        "2_sparse_multigrid_solver_transport.ipynb",
        "# Transport on (8, 512) — multigrid-FGMRES path\n\n"
        "Large-grid transport through the MultigridLayer with an n_grid=6 "
        "hierarchy and runtime config overrides (reference notebook 2, "
        "cells 6/18).",
    ),
    "data_viz.py": (
        "pde_data.ipynb",
        "# Dataset visualization\n\n"
        "Self-generated Burgers / Ginzburg-Landau / Kamani datasets "
        "(reference pde_data.ipynb; its GL arrays are missing LFS blobs, "
        "ours are regenerated from the governing equations).",
    ),
}

FIT_NB = (
    "3_pde_fit_test.ipynb",
    "# Sine-surface PDE fit\n\n"
    "Learn constant coefficients + source grid of a damped-sine PDE "
    "directly (no discovery bases) through the dense layer (reference "
    "notebook 3 / fit/sine_pde_dense.py).",
    "import jax\n"
    "jax.config.update(\"jax_enable_x64\", True)\n"
    "from mech_nn_discovery_pde_tpu.fit.sine_fit import SineFitConfig, train\n",
    "params, model, losses = train(SineFitConfig(epochs=40))\n"
    "print(f\"final loss {losses[-1]:.3e}\")\n",
)


def code_cell(src):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": src.splitlines(keepends=True)}


def md_cell(src):
    return {"cell_type": "markdown", "metadata": {},
            "source": src.splitlines(keepends=True)}


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def script_to_cells(path):
    text = open(path).read()
    # strip the script-only sys.path bootstrap (__file__ is undefined in
    # notebooks; notebook users run from the repo root)
    text = re.sub(r"^import os, sys; sys\.path\.insert[^\n]*\n", "", text)
    # strip module docstring (reproduced by the markdown header)
    text = re.sub(r'^""".*?"""\s*', "", text, count=1, flags=re.S)
    # split at top-level defs so each function is its own cell
    parts = re.split(r"\n(?=def |if __name__)", text)
    cells = []
    for p in parts:
        if p.startswith("if __name__"):
            cells.append(code_cell("main()"))
        elif p.strip():
            cells.append(code_cell(p.strip() + "\n"))
    return cells


def main():
    for script, (nb_name, header) in NOTEBOOKS.items():
        cells = [md_cell(header)] + script_to_cells(os.path.join(HERE, script))
        out = os.path.join(HERE, nb_name)
        with open(out, "w") as f:
            json.dump(notebook(cells), f, indent=1)
        print("wrote", out)

    nb_name, header, setup, run = FIT_NB
    cells = [md_cell(header), code_cell(setup), code_cell(run)]
    with open(os.path.join(HERE, nb_name), "w") as f:
        json.dump(notebook(cells), f, indent=1)
    print("wrote", os.path.join(HERE, nb_name))


if __name__ == "__main__":
    main()

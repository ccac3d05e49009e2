"""Preconditioner-quality vs solver-budget sweep (CPU, f64 vectors).

Question (round 3, VERDICT item 2): the GL step decomposition showed the
smoother (cheb 10+10 -> 5+5) and the FGMRES budget (40 -> 20 iters) each
cut the step time roughly in half.  Both are only admissible if the
resulting residual still beats the reference's own 40-iteration quality —
its GS 5+5 V-cycle FGMRES(10)x4 anchor (faithful scipy replication,
benchmarks/ref_gs_replication.py; reference solver/multigrid.py:399-498,
config.py:14-24).

This sweep measures OUR relative residual on the GL-shaped system at
iteration budgets {10, 20, 30, 40} for smoother budgets {10+10, 5+5, 7+7}
and prints each against the GS@40 anchor.

Usage: python benchmarks/budget_quality.py [gl|transport]
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)  # ref_gs_replication
sys.path.insert(0, os.path.dirname(_HERE))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import numpy.linalg as npl
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer

from ref_gs_replication import fgmres40  # noqa: E402  (same dir)


def build(kind, **config_over):
    if kind == "transport":
        bs, dims, ng = 1, (32, 32), 3
        ivs = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    else:
        bs, dims, ng = 1, (8, 32, 32), 3
        ivs = [
            lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
            lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
            lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
            lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
            lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
        ]
    layer = MultigridLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1,
                           n_iv=1, init_index_mi_list=ivs, solver_dbl=True,
                           n_grid=ng, downsample_first=(kind == "transport"),
                           config=PDEConfig(precision="f64", **config_over))
    mgs = layer.mg_solver
    rng = np.random.default_rng(0)
    gs_ = layer.grid_size
    coeffs = np.zeros((bs, gs_, layer.n_orders))
    coeffs[..., 1] = 1.0
    if kind == "transport":
        coeffs[..., 2] = 1.0
    else:
        coeffs[..., 5] = -0.1
        coeffs[..., 6] = -0.1
    rhs = np.zeros((bs, gs_))
    iv = 0.1 * rng.standard_normal((bs, mgs.systems[0].n_init_rows))
    steps = [jnp.asarray(np.full((bs, d - 1), 0.05)) for d in dims]
    coeffs, rhs, iv = jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv)

    sys0 = mgs.systems[0]
    vals = np.asarray(sys0.fill_values(coeffs, steps, dtype=jnp.float64))[0]
    A0 = sp.coo_matrix(
        (vals, (np.asarray(sys0.rows_all), np.asarray(sys0.cols_all))),
        shape=(sys0.n_rows, sys0.num_vars),
    ).tocsr()
    rhs_vec = np.asarray(sys0.fill_rhs(rhs, iv, dtype=jnp.float64))[0]
    AtA0 = (A0.T @ A0).tocsr()
    b = A0.T @ rhs_vec

    values = sys0.fill_values(coeffs, steps, dtype=jnp.float64)
    hier = mgs.build_hierarchy(coeffs, rhs, iv, steps, values)
    h0 = jax.tree.map(lambda a: a[0], hier)

    def pre(v):
        return np.asarray(mgs.precondition(h0, jnp.asarray(v)))

    return layer, mgs, AtA0, b, pre


def gs_anchor(kind):
    """Reference GS 5+5 V-cycle relres at the 40-iteration budget."""
    layer, mgs, AtA0, b, _ = build(kind)
    ng = mgs.n_grid
    # rebuild the full CSR hierarchy for GS
    A_list = []
    rng = np.random.default_rng(0)
    gs_ = layer.grid_size
    dims = mgs.dim_list[0]
    coeffs = np.zeros((1, gs_, layer.n_orders))
    coeffs[..., 1] = 1.0
    if kind == "transport":
        coeffs[..., 2] = 1.0
    else:
        coeffs[..., 5] = -0.1
        coeffs[..., 6] = -0.1
    rhs = np.zeros((1, gs_))
    iv = 0.1 * rng.standard_normal((1, mgs.systems[0].n_init_rows))
    steps = [jnp.asarray(np.full((1, d - 1), 0.05)) for d in dims]
    coeffs, rhs, iv = jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv)
    c, r, i, s = coeffs, rhs, iv, steps
    for k in range(ng):
        sysk = mgs.systems[k]
        if k > 0:
            c = mgs.downsample_coeffs(k - 1, c)
            r = mgs.downsample_rhs(k - 1, r)
            s = mgs.downsample_steps(k - 1, s)
            i = mgs.downsample_iv(k - 1, i)
        vals = np.asarray(sysk.fill_values(c, s, dtype=jnp.float64))[0]
        A_list.append(sp.coo_matrix(
            (vals, (np.asarray(sysk.rows_all), np.asarray(sysk.cols_all))),
            shape=(sysk.n_rows, sysk.num_vars)).tocsr())
    AtA = [(A.T @ A).tocsr() for A in A_list]
    L = [sp.tril(M, 0).tocsr() for M in AtA]
    U = [sp.triu(M, 1).tocsr() for M in AtA]
    coarse = AtA[-1].toarray()

    def restrict(k, x):
        return np.asarray(mgs._restrict_vec(k, jnp.asarray(x)))

    def prolong(k, x):
        return np.asarray(mgs._prolong_vec(k, jnp.asarray(x)))

    def gs(k, bb, x, n=5):
        for _ in range(n):
            x = spla.spsolve_triangular(L[k], bb - U[k] @ x, lower=True)
        return x

    def vc(k, bb, x):
        x = gs(k, bb, x)
        rr = bb - AtA[k] @ x
        rH = restrict(k, rr)
        dH = (npl.solve(coarse, rH) if k == ng - 2
              else vc(k + 1, rH, np.zeros_like(rH)))
        x = x + prolong(k, dH)
        return gs(k, bb, x)

    res = fgmres40(AtA0, lambda v: vc(0, v, np.zeros_like(b)), b)
    print(f"[{kind}] anchor: reference GS 5+5 relres@40 = {res:.3e}",
          flush=True)
    return res


def main(kind):
    anchor = gs_anchor(kind)
    for pre_steps, post_steps in [(10, 10), (7, 7), (5, 5)]:
        _, _, AtA0, b, pre = build(
            kind,
            mg_smoother_steps_pre=pre_steps,
            mg_smoother_steps_post=post_steps,
        )
        for outers in (1, 2, 3, 4):
            res = fgmres40(AtA0, pre, b, restart=10, outers=outers)
            ok = "BEATS" if res <= anchor else "worse than"
            print(f"[{kind}] cheb {pre_steps}+{post_steps} relres@"
                  f"{10 * outers:2d} = {res:.3e}  ({ok} GS@40 anchor)",
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "gl")

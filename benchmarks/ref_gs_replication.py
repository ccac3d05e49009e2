"""Faithful scipy replication of the reference's GS-smoothed V-cycle FGMRES,
vs this framework's smoother variants, at equal iteration budgets.

Used to calibrate smoother choices per workload (run on CPU):
  python benchmarks/ref_gs_replication.py transport
  python benchmarks/ref_gs_replication.py gl
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import numpy.linalg as npl
import scipy.linalg as sla
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer


def build_problem(kind):
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
    layer = MultigridLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                           init_index_mi_list=ivs, solver_dbl=True, n_grid=ng,
                           downsample_first=(kind == "transport"),
                           config=PDEConfig(precision="f64"))
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

    A_list = []
    c, r, i, s = coeffs, rhs, iv, steps
    for k in range(ng):
        sysk = mgs.systems[k]
        if k > 0:
            c = mgs.downsample_coeffs(k - 1, c)
            r = mgs.downsample_rhs(k - 1, r)
            s = mgs.downsample_steps(k - 1, s)
            i = mgs.downsample_iv(k - 1, i)
        vals = np.asarray(sysk.fill_values(c, s, dtype=jnp.float64))[0]
        A = sp.coo_matrix(
            (vals, (np.asarray(sysk.rows_all), np.asarray(sysk.cols_all))),
            shape=(sysk.n_rows, sysk.num_vars),
        ).tocsr()
        A_list.append(A)
        if k == 0:
            rhs_vec = np.asarray(sysk.fill_rhs(r, i, dtype=jnp.float64))[0]
    return layer, mgs, A_list, rhs_vec, ng, dims


def fgmres40(AtA0, pre, b, restart=10, outers=4):
    x = np.zeros_like(b)
    for _ in range(outers):
        rr = b - AtA0 @ x
        beta = npl.norm(rr)
        m = restart
        V = np.zeros((m + 1, len(b)))
        Z = np.zeros((m, len(b)))
        H = np.zeros((m + 1, m))
        V[0] = rr / beta
        for j in range(m):
            z = pre(V[j])
            Z[j] = z
            w = AtA0 @ z
            for t in range(j + 1):
                H[t, j] = V[t] @ w
                w -= H[t, j] * V[t]
            H[j + 1, j] = npl.norm(w)
            if H[j + 1, j] > 0:
                V[j + 1] = w / H[j + 1, j]
        e = np.zeros(m + 1)
        e[0] = beta
        y, _, _, _ = npl.lstsq(H, e, rcond=None)
        x = x + Z.T @ y
    return npl.norm(b - AtA0 @ x) / npl.norm(b)


def main(kind):
    layer, mgs, A_list, rhs_vec, ng, dims = build_problem(kind)
    AtA = [(A.T @ A).tocsr() for A in A_list]
    L = [sp.tril(M, 0).tocsr() for M in AtA]
    U = [sp.triu(M, 1).tocsr() for M in AtA]
    coarse = AtA[-1].toarray()
    b = A_list[0].T @ rhs_vec

    def restrict(k, x):
        return np.asarray(mgs._restrict_vec(k, jnp.asarray(x)))

    def prolong(k, x):
        return np.asarray(mgs._prolong_vec(k, jnp.asarray(x)))

    # --- reference: scalar GS, raw values ---
    def gs(k, bb, x, n=5):
        for _ in range(n):
            x = spla.spsolve_triangular(L[k], bb - U[k] @ x, lower=True)
        return x

    def vc_gs(k, bb, x):
        x = gs(k, bb, x)
        rr = bb - AtA[k] @ x
        rH = restrict(k, rr)
        dH = npl.solve(coarse, rH) if k == ng - 2 else vc_gs(k + 1, rH, np.zeros_like(rH))
        x = x + prolong(k, dH)
        return gs(k, bb, x)

    print(f"[{kind}] reference GS 5+5:        relres@40 = "
          f"{fgmres40(AtA[0], lambda v: vc_gs(0, v, np.zeros_like(b)), b):.3e}",
          flush=True)

    # --- this framework (its real JAX path) ---
    sys0 = mgs.systems[0]
    import jax as _jax

    rng = np.random.default_rng(0)
    gs_ = layer.grid_size
    coeffs = np.zeros((1, gs_, layer.n_orders))
    coeffs[..., 1] = 1.0
    if kind == "transport":
        coeffs[..., 2] = 1.0
    else:
        coeffs[..., 5] = -0.1
        coeffs[..., 6] = -0.1
    rhs = np.zeros((1, gs_))
    iv = 0.1 * np.random.default_rng(0).standard_normal((1, sys0.n_init_rows))
    steps = [jnp.asarray(np.full((1, d - 1), 0.05)) for d in dims]
    coeffs, rhs, iv = jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv)
    values = sys0.fill_values(coeffs, steps, dtype=jnp.float64)
    rv = sys0.fill_rhs(rhs, iv, dtype=jnp.float64)
    hier = mgs.build_hierarchy(coeffs, rhs, iv, steps, values)
    h0 = _jax.tree.map(lambda a: a[0], hier)

    def pre_jax(v):
        return np.asarray(mgs.precondition(h0, jnp.asarray(v)))

    print(f"[{kind}] cheb line-block (ours):  relres@40 = "
          f"{fgmres40(AtA[0], pre_jax, b):.3e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "transport")

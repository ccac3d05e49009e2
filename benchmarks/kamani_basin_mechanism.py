"""Mechanism experiment for the Kamani lazy basin (round 3).

Hypothesis (chicken-and-egg, discovery/kamani.py exp_init_bias docstring):
with the p1 row pinned at 0 the exponents er[1] receive no data gradient
and freeze at wrong values; growing p1 against WRONG exponents raises the
loss, so the optimizer keeps p1 pinned.  If so, the escape direction
(grow p1 toward truth) only exists once the exponents are (near) correct —
which justifies the shear-thinning exponent prior (exp_init_bias) as the
mechanism-targeted deviation, rather than lr/L1 tweaks.

Test: at the ACTUAL 5000-epoch lazy endpoint (logs/kamani_final_s0), sweep
p1row = alpha * true_p1row and report loss(alpha) and d loss/d p1row at
alpha=0, under (a) the learned lazy exponents and (b) the true exponents
(-1, -0.584).  Nets bypassed exactly as in kamani_grad_parity.py (up = u).

CPU, f64.  Usage: python benchmarks/kamani_basin_mechanism.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.data.datasets import KamaniDataset
from mech_nn_discovery_pde_tpu.discovery.kamani import true_params
from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

# final epoch-4999 learned parameters, logs/kamani_final_s0/log.txt
LAZY_PR = np.array([
    [-1.9497395e-02, -9.5207567e+00, -7.8650169e+00],
    [7.2326497e-03, 2.0842995e-03, 7.6066377e-04],
    [2.4127292e-03, -4.8028317e-01, -6.4090830e-01],
    [1.0, 0.0, 0.0],
])
LAZY_ER = np.array([
    [-1.4007394, 1.9999894],
    [0.11231029, -0.3106795],
    [-1.9999999, -1.9999332],
    [0.901391, 1.500709],
])


def main():
    bs, nt = 512, 24
    ds = KamaniDataset(solver_dim=(nt,), data_root=os.path.join(REPO, "data"))
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=bs, replace=False)
    items = [ds[int(i)] for i in idx]
    u = jnp.asarray(np.stack([it[1] for it in items]).reshape(bs, -1))
    sd = jnp.asarray(np.stack([it[3] for it in items]))
    sdd = jnp.asarray(np.stack([it[4] for it in items]))
    up = u  # idealized transform (kamani_grad_parity.py convention)

    layer = PDEDenseLayer(
        bs=bs, coord_dims=(nt,), order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=[lambda n: (0, 0, [0], [0])], solver_dbl=True,
        config=PDEConfig(precision="f64"),
    )
    steps = [jnp.full((bs, nt - 1), float(ds.t_step), jnp.float64)]

    def loss_fn(pr, er):
        sa = jnp.abs(sd)
        basis = lambda i: (pr[i, 0] + pr[i, 1] * sa ** er[i, 0]
                           + pr[i, 2] * sa ** er[i, 1])
        p0, p1, p2, p3 = (basis(i) for i in range(4))
        coeffs = jnp.zeros((bs, layer.grid_size, layer.n_orders))
        coeffs = coeffs.at[..., 0].set(p3).at[..., 1].set(p0)
        rhs = p1 * sd + p2 * sdd
        u0, _, _ = layer(coeffs, rhs, up[:, 0:1], steps)
        u0 = u0.reshape(bs, -1)
        u_loss = jnp.abs(u0 - u).mean(axis=-1).mean()
        var_loss = jnp.abs(up - u0).mean(axis=-1).mean()
        return u_loss + var_loss + 0.01 * jnp.abs(pr).sum()

    loss_jit = jax.jit(loss_fn)
    grad_jit = jax.jit(jax.grad(loss_fn, argnums=0))

    true_pr, true_er = true_params()
    variants = {
        "lazy er (learned)": LAZY_ER,
        "true er row1 only": np.concatenate(
            [LAZY_ER[:1], true_er[1:2], LAZY_ER[2:]], axis=0),
        "true er (all rows)": true_er,
    }
    print(f"lazy endpoint reference: loss(alpha=0) must match across "
          f"variants up to er rows with zero pr weight", flush=True)
    for tag, er in variants.items():
        er = np.asarray(er, dtype=np.float64)
        print(f"--- {tag} ---", flush=True)
        g = np.asarray(grad_jit(jnp.asarray(LAZY_PR), jnp.asarray(er)))
        print(f"  d loss/d p1row at alpha=0: {g[1]}  (L1 pressure 0.01)",
              flush=True)
        for alpha in (0.0, 0.01, 0.05, 0.2, 1.0):
            pr = LAZY_PR.copy()
            pr[1] = alpha * true_pr[1]
            val = float(loss_jit(jnp.asarray(pr), jnp.asarray(er)))
            print(f"  alpha={alpha:5.2f}  loss={val:.4f}", flush=True)


if __name__ == "__main__" and "barrier" not in sys.argv:
    main()


def barrier_profile():
    """Loss along the straight line (pr, er) = (1-t)*lazy + t*true.
    A hump (loss above both endpoints at intermediate t) is direct
    evidence of a genuine barrier between the basins."""
    bs, nt = 512, 24
    ds = KamaniDataset(solver_dim=(nt,), data_root=os.path.join(REPO, "data"))
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=bs, replace=False)
    items = [ds[int(i)] for i in idx]
    u = jnp.asarray(np.stack([it[1] for it in items]).reshape(bs, -1))
    sd = jnp.asarray(np.stack([it[3] for it in items]))
    sdd = jnp.asarray(np.stack([it[4] for it in items]))
    up = u

    layer = PDEDenseLayer(
        bs=bs, coord_dims=(nt,), order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=[lambda n: (0, 0, [0], [0])], solver_dbl=True,
        config=PDEConfig(precision="f64"),
    )
    steps = [jnp.full((bs, nt - 1), float(ds.t_step), jnp.float64)]

    def loss_fn(pr, er):
        sa = jnp.abs(sd)
        basis = lambda i: (pr[i, 0] + pr[i, 1] * sa ** er[i, 0]
                           + pr[i, 2] * sa ** er[i, 1])
        p0, p1, p2, p3 = (basis(i) for i in range(4))
        coeffs = jnp.zeros((bs, layer.grid_size, layer.n_orders))
        coeffs = coeffs.at[..., 0].set(p3).at[..., 1].set(p0)
        rhs = p1 * sd + p2 * sdd
        u0, _, _ = layer(coeffs, rhs, up[:, 0:1], steps)
        u0 = u0.reshape(bs, -1)
        u_loss = jnp.abs(u0 - u).mean(axis=-1).mean()
        var_loss = jnp.abs(up - u0).mean(axis=-1).mean()
        return u_loss + var_loss + 0.01 * jnp.abs(pr).sum()

    loss_jit = jax.jit(loss_fn)
    true_pr, true_er = true_params()
    print("--- barrier profile: (1-t)*lazy + t*true ---", flush=True)
    for t in (0.0, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0):
        pr = (1 - t) * LAZY_PR + t * true_pr
        er = (1 - t) * LAZY_ER + t * true_er
        val = float(loss_jit(jnp.asarray(pr), jnp.asarray(er)))
        print(f"  t={t:4.2f}  loss={val:.4f}", flush=True)


if __name__ == "__main__" and "barrier" in sys.argv:
    barrier_profile()


def reachability_profile():
    """loss(s * true_pr, true_er) for s in [0, 1]: with the exponents held
    at truth, is the true basin downhill from near-zero coefficients (the
    init region)?  If yes, an exponent prior at init makes recovery a
    plain descent; if a hump remains, even correct exponents cannot save
    a generic init."""
    bs, nt = 512, 24
    ds = KamaniDataset(solver_dim=(nt,), data_root=os.path.join(REPO, "data"))
    rng = np.random.default_rng(0)
    idx = rng.choice(len(ds), size=bs, replace=False)
    items = [ds[int(i)] for i in idx]
    u = jnp.asarray(np.stack([it[1] for it in items]).reshape(bs, -1))
    sd = jnp.asarray(np.stack([it[3] for it in items]))
    sdd = jnp.asarray(np.stack([it[4] for it in items]))
    up = u

    layer = PDEDenseLayer(
        bs=bs, coord_dims=(nt,), order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=[lambda n: (0, 0, [0], [0])], solver_dbl=True,
        config=PDEConfig(precision="f64"),
    )
    steps = [jnp.full((bs, nt - 1), float(ds.t_step), jnp.float64)]

    def loss_fn(pr, er):
        sa = jnp.abs(sd)
        basis = lambda i: (pr[i, 0] + pr[i, 1] * sa ** er[i, 0]
                           + pr[i, 2] * sa ** er[i, 1])
        p0, p1, p2, p3 = (basis(i) for i in range(4))
        coeffs = jnp.zeros((bs, layer.grid_size, layer.n_orders))
        coeffs = coeffs.at[..., 0].set(p3).at[..., 1].set(p0)
        rhs = p1 * sd + p2 * sdd
        u0, _, _ = layer(coeffs, rhs, up[:, 0:1], steps)
        u0 = u0.reshape(bs, -1)
        u_loss = jnp.abs(u0 - u).mean(axis=-1).mean()
        var_loss = jnp.abs(up - u0).mean(axis=-1).mean()
        return u_loss + var_loss + 0.01 * jnp.abs(pr).sum()

    loss_jit = jax.jit(loss_fn)
    true_pr, true_er = true_params()
    print("--- reachability: loss(s*true_pr, true_er), sigma row pinned ---",
          flush=True)
    for s in (0.0, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0):
        pr = s * true_pr
        pr[3] = [1.0, 0.0, 0.0]  # pinned sigma row, as in training
        val = float(loss_jit(jnp.asarray(pr), jnp.asarray(true_er)))
        print(f"  s={s:4.2f}  loss={val:.4f}", flush=True)


if __name__ == "__main__" and "reach" in sys.argv:
    reachability_profile()

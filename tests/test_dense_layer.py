"""End-to-end tests for the dense PDE layer: forward accuracy on problems
with known solutions, and IFT gradients vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer


def transport_layer(bs=2, dims=(8, 64)):
    iv_list = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    return PDEDenseLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, solver_dbl=True,
    )


def test_transport_advection():
    """u_t + u_x = 0 with u(0, x) = sin(kx) advects: u(t, x) = sin(k(x - t)).
    Mirrors the reference transport notebook (examples/1, cells 10-17)."""
    bs, dims = 2, (8, 64)
    layer = transport_layer(bs, dims)
    t_step, x_step = 0.01, 2 * np.pi / dims[1]

    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 1] = 1.0  # u_t
    coeffs[..., 2] = 1.0  # u_x
    rhs = np.zeros((bs, layer.grid_size))
    x = np.linspace(0, 2 * np.pi, dims[1], endpoint=False)
    iv = np.stack([np.sin((k + 1) * x) for k in range(bs)], axis=0)
    steps = [
        np.full((bs, dims[0] - 1), t_step),
        np.full((bs, dims[1] - 1), x_step),
    ]

    u0, u, eps = layer(
        jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv),
        [jnp.asarray(s) for s in steps],
    )
    u0 = np.asarray(u0).reshape(bs, *dims)
    t = np.arange(dims[0]) * t_step
    for k in range(bs):
        expect = np.sin((k + 1) * (x[None, :] - t[:, None]))
        err = np.abs(u0[k] - expect)
        # spatial edges are unconstrained (only the t=0 face is pinned), so
        # accuracy is judged on the interior; edges stay bounded
        assert err[:, 3:-3].max() < 2e-3, f"interior advection error {err.max()}"
        assert err.max() < 0.05


def test_ode_exponential():
    """1D ODE u_t - u = 0, u(0) = 1 -> u = exp(t)."""
    bs, dims = 3, (16,)
    iv_list = [lambda nt: (0, 0, [0], [0])]
    layer = PDEDenseLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, solver_dbl=True,
    )
    h = 0.05
    coeffs = np.zeros((bs, dims[0], layer.n_orders))
    coeffs[..., 0] = -1.0
    coeffs[..., 1] = 1.0
    rhs = np.zeros((bs, dims[0]))
    iv = np.ones((bs, 1))
    steps = [np.full((bs, dims[0] - 1), h)]
    u0, u, _ = layer(*map(jnp.asarray, (coeffs, rhs, iv)), [jnp.asarray(steps[0])])
    t = np.arange(dims[0]) * h
    err = np.abs(np.asarray(u0)[0, 0] - np.exp(t)).max()
    assert err < 1e-3, f"exp ODE error {err}"
    # the solved first derivative should track u as well
    err_d = np.abs(np.asarray(u)[0, 0, :, 1] - np.exp(t)).max()
    assert err_d < 2e-3


def test_ift_gradients_match_finite_differences():
    """Gradients through the custom-VJP solve (coeffs, rhs, iv, steps) agree
    with central finite differences."""
    bs, dims = 2, (7,)
    iv_list = [lambda nt: (0, 0, [0], [0])]
    layer = PDEDenseLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, solver_dbl=True,
    )
    rng = np.random.default_rng(0)
    n = dims[0]
    coeffs0 = rng.standard_normal((bs, n, layer.n_orders)) * 0.3
    coeffs0[..., 1] += 1.0  # keep system well-posed
    rhs0 = rng.standard_normal((bs, n)) * 0.1
    iv0 = rng.standard_normal((bs, 1))
    steps0 = 0.1 + 0.05 * rng.random((bs, n - 1))
    w = rng.standard_normal((bs, 1, n))

    def loss(coeffs, rhs, iv, steps):
        u0, u, _ = layer(coeffs, rhs, iv, [steps])
        return jnp.sum(w * u0) + jnp.sum(u[..., 2] ** 2) * 0.1

    args = tuple(map(jnp.asarray, (coeffs0, rhs0, iv0, steps0)))
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)

    eps = 1e-6
    for ai, name in [(0, "coeffs"), (1, "rhs"), (2, "iv"), (3, "steps")]:
        a = np.asarray(args[ai])
        g = np.asarray(grads[ai])
        idxs = [tuple(rng.integers(0, s) for s in a.shape) for _ in range(5)]
        for idx in idxs:
            ap, am = a.copy(), a.copy()
            ap[idx] += eps
            am[idx] -= eps
            largs = list(args)
            largs[ai] = jnp.asarray(ap)
            lp = float(loss(*largs))
            largs[ai] = jnp.asarray(am)
            lm = float(loss(*largs))
            fd = (lp - lm) / (2 * eps)
            assert np.isclose(g[idx], fd, rtol=2e-4, atol=1e-6), (
                f"{name}{idx}: ad={g[idx]} fd={fd}"
            )


def test_f32_ir_matches_f64():
    """Mixed-precision iterative refinement reproduces the f64 solution."""
    from mech_nn_discovery_pde_tpu.config import PDEConfig

    bs, dims = 2, (8, 12)
    iv_list = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    kw = dict(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
              init_index_mi_list=iv_list, solver_dbl=True)
    layer64 = PDEDenseLayer(config=PDEConfig(precision="f64"), **kw)
    layer_ir = PDEDenseLayer(config=PDEConfig(precision="f32_ir", ir_steps=8), **kw)

    rng = np.random.default_rng(1)
    coeffs = np.zeros((bs, layer64.grid_size, layer64.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 0.5
    rhs = 0.1 * rng.standard_normal((bs, layer64.grid_size))
    iv = rng.standard_normal((bs, dims[1]))
    steps = [np.full((bs, dims[0] - 1), 0.02), np.full((bs, dims[1] - 1), 0.1)]
    args = (jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv),
            [jnp.asarray(s) for s in steps])
    u0_a = np.asarray(layer64(*args)[0])
    u0_b = np.asarray(layer_ir(*args)[0])
    # the f32 stability ridge slows IR slightly; 1e-7 is still far below
    # any training-relevant scale
    assert np.abs(u0_a - u0_b).max() < 1e-7


def test_n_ind_dim_multiple_systems():
    """n_ind_dim > 1 solves independent systems side by side (the reference
    folds bs*n_ind_dim through one PDESYSLP; GL uses it for u/v fields)."""
    bs, nd, dims = 2, 2, (8, 10)
    ivs = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=nd, n_iv=1,
                          init_index_mi_list=ivs, solver_dbl=True)
    single = PDEDenseLayer(bs=bs * nd, coord_dims=dims, order=2, n_ind_dim=1,
                           n_iv=1, init_index_mi_list=ivs, solver_dbl=True)
    rng = np.random.default_rng(0)
    gs = layer.grid_size
    coeffs = np.zeros((bs, nd, gs, layer.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 0.3
    rhs = 0.1 * rng.standard_normal((bs, nd, gs))
    iv = rng.standard_normal((bs, nd, dims[1]))
    steps = [np.broadcast_to(np.full((1, d - 1), 0.05), (bs * nd, d - 1)).copy()
             for d in dims]
    args = [jnp.asarray(a) for a in (coeffs, rhs, iv)]
    u0, u, _ = layer(*args, [jnp.asarray(s) for s in steps])
    assert u0.shape == (bs, nd, gs)
    u0s, _, _ = single(args[0].reshape(bs * nd, gs, -1), args[1].reshape(bs * nd, gs),
                       args[2].reshape(bs * nd, -1), [jnp.asarray(s) for s in steps])
    np.testing.assert_allclose(np.asarray(u0).reshape(bs * nd, gs),
                               np.asarray(u0s).reshape(bs * nd, gs), rtol=1e-10)


def test_solve_stats():
    bs, dims = 2, (8, 10)
    ivs = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=ivs, solver_dbl=True)
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 1] = 1.0
    rhs = 0.1 * rng.standard_normal((bs, layer.grid_size))
    iv = rng.standard_normal((bs, dims[1]))
    steps = [jnp.asarray(np.full((bs, d - 1), 0.05)) for d in dims]
    stats = layer.solve_stats(jnp.asarray(coeffs), jnp.asarray(rhs),
                              jnp.asarray(iv), steps)
    assert bool(stats["finite"].all())
    assert float(stats["rel_rnorm"].max()) < 1e-8

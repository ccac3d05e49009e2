"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from mech_nn_discovery_pde_tpu.parallel import halo, mesh as pmesh


def test_mesh_creation():
    m = pmesh.make_mesh()
    assert m.shape["dp"] == len(jax.devices())
    m2 = pmesh.make_mesh((4, 2))
    assert m2.shape["dp"] == 4 and m2.shape["sp"] == 2


def test_batch_sharded_layer_forward():
    """Dense layer forward jitted with a dp-sharded batch matches the
    single-device result."""
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    bs, dims = 8, (8, 12)
    iv = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=iv, solver_dbl=True)
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 0.3
    rhs = 0.1 * rng.standard_normal((bs, layer.grid_size))
    ivr = rng.standard_normal((bs, dims[1]))
    steps = [np.full((bs, d - 1), 0.05) for d in dims]

    args = (jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(ivr),
            [jnp.asarray(s) for s in steps])
    fn = jax.jit(lambda c, r, i, s: layer(c, r, i, s)[0])
    expect = np.asarray(fn(*args))

    m = pmesh.make_mesh((8, 1))
    sharded_args = pmesh.shard_batch_tree(m, args)
    got = np.asarray(fn(*sharded_args))
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)


def test_halo_derivative_matches_dense():
    """Sharded 5-point derivative with ppermute halo exchange == unsharded."""
    m = pmesh.make_mesh((1, 8))
    n = 64
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n, 16)))
    w = jnp.asarray([1 / 12, -2 / 3, 0.0, 2 / 3, -1 / 12])
    fn = halo.sharded_axis_derivative(m, w)
    with m:
        got = np.asarray(jax.jit(fn)(x))
    # unsharded reference (zero-padded at the global edges like the kernel)
    xp = jnp.pad(x, ((halo.HALO, halo.HALO), (0, 0)))
    expect = sum(
        float(w[k]) * np.asarray(xp[halo.HALO - 2 + k : halo.HALO - 2 + k + n])
        for k in range(5)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)


def test_sharded_training_step_runs():
    """A full discovery-style training step (paramnet -> coeffs -> dense
    solve -> loss -> adam) compiles and runs with dp x sp sharding."""
    import optax
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer
    from mech_nn_discovery_pde_tpu.models.paramnet import ParamNet

    bs, dims = 8, (8, 12)
    ivs = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=ivs, solver_dbl=True)
    pnet = ParamNet(n_out=2, depth=2)
    params = pnet.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.standard_normal((bs, dims[0], dims[1])))
    steps = [jnp.full((bs, d - 1), 0.05) for d in dims]

    def loss_fn(params, data):
        c = pnet.apply(params)[0]
        coeffs = jnp.zeros((bs, layer.grid_size, layer.n_orders))
        coeffs = coeffs.at[..., 1].set(1.0).at[..., 2].set(c[0]).at[..., 4].set(c[1])
        rhs = jnp.zeros((bs, layer.grid_size))
        ivr = data[:, 0, :]
        u0, _, _ = layer(coeffs, rhs, ivr, steps)
        return jnp.mean((u0.reshape(bs, -1) - data.reshape(bs, -1)) ** 2)

    @jax.jit
    def step(params, opt_state, data):
        loss, g = jax.value_and_grad(loss_fn)(params, data)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    m = pmesh.make_mesh((4, 2))
    data_sh = jax.device_put(data, jax.sharding.NamedSharding(m, P("dp", "sp", None)))
    params_sh = pmesh.shard_batch_tree(m, params)  # replicated (dims don't divide)
    p2, o2, loss = step(params_sh, opt_state, data_sh)
    assert np.isfinite(float(loss))

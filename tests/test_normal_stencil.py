"""Block-stencil AtA assembly (ops/normal_stencil.py) vs the COO ground
truth: the assembled operator must reproduce rmatvec(matvec(x)) exactly
(up to f64 roundoff) for every dimensionality, order, and boundary-box
configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
    build_normal_coef,
    make_desc,
    normal_stencil_matvec,
)
from mech_nn_discovery_pde_tpu.ops.structured import split_values
from mech_nn_discovery_pde_tpu.ops.system import PDESystem


IVS = {
    1: [lambda nt: (0, 0, [0], [0])],
    2: [
        lambda nt, nx: (0, 0, [0, 0], [0, nx - 1]),
        lambda nt, nx: (1, 1, [1, 0], [nt - 1, 0]),
    ],
    3: [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
    ],
}


@pytest.mark.parametrize(
    "dims,order,n_iv",
    [
        ((9,), 2, 1),
        ((8,), 1, 1),
        ((12,), 2, 3),
        ((7, 9), 2, 1),
        ((6, 8), 1, 1),
        ((8, 6), 2, 2),
        ((6, 7, 8), 2, 1),
    ],
)
def test_stencil_matches_coo(dims, order, n_iv):
    sys = PDESystem.build(
        dims, order=order, init_index_mi_list=IVS[len(dims)], n_iv=n_iv,
        step_size=0.2,
    )
    rng = np.random.default_rng(hash((dims, order, n_iv)) % 2**31)
    values = jnp.asarray(rng.standard_normal(sys.n_entries))
    x = jnp.asarray(rng.standard_normal(sys.num_vars))

    want = sys.rmatvec_coo(values, sys.matvec_coo(values, x))

    desc = make_desc(sys.spec)
    sv = split_values(sys.spec, values)
    coef = build_normal_coef(sys.spec, desc, sv)
    got = normal_stencil_matvec(desc, coef, x)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-10
    )


def test_stencil_batched_vmap():
    dims = (7, 8)
    sys = PDESystem.build(dims, order=2, init_index_mi_list=IVS[2], n_iv=1,
                          step_size=0.1)
    rng = np.random.default_rng(0)
    bs = 3
    values = jnp.asarray(rng.standard_normal((bs, sys.n_entries)))
    x = jnp.asarray(rng.standard_normal((bs, sys.num_vars)))
    desc = make_desc(sys.spec)

    def one(v, xi):
        sv = split_values(sys.spec, v)
        return normal_stencil_matvec(desc, build_normal_coef(sys.spec, desc, sv), xi)

    got = jax.vmap(one)(values, x)
    for i in range(bs):
        want = sys.rmatvec_coo(values[i], sys.matvec_coo(values[i], x[i]))
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-10, atol=1e-10)


def test_stencil_realistic_fill():
    """With real fill_values (transport coefficients, non-uniform steps) the
    stencil operator matches, including the one-sided edge stencils."""
    dims = (8, 10)
    sys = PDESystem.build(dims, order=2, init_index_mi_list=IVS[2], n_iv=1)
    rng = np.random.default_rng(1)
    coeffs = jnp.asarray(rng.standard_normal((1, sys.var_set.grid_size, sys.var_set.n_mi)))
    steps = [jnp.asarray(0.05 + 0.02 * rng.random((1, d - 1))) for d in dims]
    values = sys.fill_values(coeffs, steps, dtype=jnp.float64)[0]
    x = jnp.asarray(rng.standard_normal(sys.num_vars))

    want = sys.rmatvec_coo(values, sys.matvec_coo(values, x))
    desc = make_desc(sys.spec)
    coef = build_normal_coef(sys.spec, desc, split_values(sys.spec, values))
    got = normal_stencil_matvec(desc, coef, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-10)


def test_pallas_apply_matches_xla():
    """The Pallas VMEM apply (interpret mode on CPU) matches the XLA apply
    and the COO ground truth."""
    from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
        normal_stencil_matvec_pallas,
    )

    for dims in [(9,), (7, 9), (6, 7, 8)]:
        sys = PDESystem.build(dims, order=2, init_index_mi_list=IVS[len(dims)],
                              n_iv=1, step_size=0.15)
        rng = np.random.default_rng(3)
        values = jnp.asarray(rng.standard_normal(sys.n_entries).astype(np.float32))
        x = jnp.asarray(rng.standard_normal(sys.num_vars).astype(np.float32))
        desc = make_desc(sys.spec)
        coef = build_normal_coef(sys.spec, desc, split_values(sys.spec, values))
        want = normal_stencil_matvec(desc, coef, x)
        got = normal_stencil_matvec_pallas(desc, coef, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_rolled_apply_matches_padded():
    """The rolled mega-batch production apply == the stride-grouped padded
    form it replaced (round-3 op-count optimization; exactness reference)."""
    from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
        normal_stencil_matvec_padded,
    )

    for dims in [(9,), (7, 9), (6, 7, 8)]:
        sys = PDESystem.build(dims, order=2, init_index_mi_list=IVS[len(dims)],
                              n_iv=1, step_size=0.15)
        rng = np.random.default_rng(5)
        values = jnp.asarray(rng.standard_normal(sys.n_entries))
        x = jnp.asarray(rng.standard_normal(sys.num_vars))
        desc = make_desc(sys.spec)
        coef = build_normal_coef(sys.spec, desc, split_values(sys.spec, values))
        got = normal_stencil_matvec(desc, coef, x)
        want = normal_stencil_matvec_padded(desc, coef, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)

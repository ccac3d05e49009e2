"""Golden/structural tests for the constraint builder and runtime fills.

The key invariant (reference test_mat_eq, lp_pde_central_diff.py:2254-2308):
runtime value generation from uniform step vectors must reproduce the static
build-time assembly exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mech_nn_discovery_pde_tpu.ops.constraints import (
    build_constraint_spec,
    render_rows,
)
from mech_nn_discovery_pde_tpu.ops.system import PDESystem
from mech_nn_discovery_pde_tpu.ops import stencil


H = 0.25


def make_spec(dims=(8, 8), order=2, ivs=None, n_iv=1):
    return build_constraint_spec(dims, order=order, init_index_mi_list=ivs or [], n_iv=n_iv, step_size=H)


def uniform_steps(spec, bs=1):
    return [
        jnp.full((bs, d - 1), H, dtype=jnp.float64) for d in spec.coord_dims
    ]


@pytest.mark.parametrize("dims", [(8,), (8, 8), (6, 7), (8, 8, 8), (6, 8, 10)])
def test_mat_eq_runtime_matches_static(dims):
    """Runtime derivative fill with uniform steps == static build values."""
    spec = make_spec(dims)
    vals = stencil.derivative_values(spec, uniform_steps(spec))
    np.testing.assert_allclose(
        np.asarray(vals[0]), spec.deriv_values_static, rtol=1e-12, atol=1e-12
    )


def test_mat_eq_order1():
    spec = make_spec((9, 8), order=1)
    vals = stencil.derivative_values(spec, uniform_steps(spec))
    np.testing.assert_allclose(
        np.asarray(vals[0]), spec.deriv_values_static, rtol=1e-12, atol=1e-12
    )


def test_counts_2d():
    """Row/entry counts for the (32,32) order-2 system match the reference
    scale numbers (SURVEY 2.2): 5120 unknowns, 930 equation rows, 4096
    central + 1984 forward + 1984 backward derivative rows."""
    ivs = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
        lambda nx, ny: (1, 0, [0, ny - 1], [nx - 1, ny - 1]),
    ]
    spec = make_spec((32, 32), ivs=ivs)
    assert spec.num_vars == 32 * 32 * 5
    assert spec.n_eq_rows == 31 * 30
    # central: grid * 2 orders * 2 coords; taylor: reduced grid per coord
    assert spec.n_deriv_rows == 32 * 32 * 2 * 2 + 2 * (31 * 32) * 2
    assert spec.n_init_rows == 31 + 31 + 32


def test_equation_fill_ordering():
    """Equation values are the interior-cropped coefficients in C-order."""
    spec = make_spec((6, 7))
    n_mi = spec.var_set.n_mi
    coeffs = jnp.arange(6 * 7 * n_mi, dtype=jnp.float64).reshape(1, 42, n_mi)
    vals = stencil.equation_values(spec, coeffs)
    grid = np.arange(6 * 7 * n_mi).reshape(6, 7, n_mi)
    expect = grid[1:, 1:-1, :].reshape(-1)
    np.testing.assert_array_equal(np.asarray(vals[0]), expect)
    # cols of equation entries point at (interior point, mi) variables
    interior = spec.var_set.interior_flat_indices()
    expect_cols = (interior[:, None] * n_mi + np.arange(n_mi)).ravel()
    np.testing.assert_array_equal(spec.eq_cols, expect_cols)


def test_pad_roundtrip():
    spec = make_spec((6, 7))
    bs = 3
    vals = jnp.asarray(np.random.randn(bs, spec.n_eq_rows))
    padded = stencil.pad_rhs(spec, vals)
    cropped = stencil.crop_rhs(spec, padded)
    np.testing.assert_allclose(np.asarray(cropped), np.asarray(vals))


def test_central_stencil_exactness():
    """The generated 5-point weights differentiate quartics exactly, at
    interior and edge positions, for non-uniform steps."""
    rng = np.random.default_rng(0)
    d = 9
    steps = jnp.asarray(0.1 + 0.2 * rng.random((1, d - 1)))
    w = stencil.stencil_weights(steps, d, order=2)  # (1, d, 2, 6)
    x = np.concatenate([[0.0], np.cumsum(np.asarray(steps[0]))])

    from mech_nn_discovery_pde_tpu.ops.constraints import central_offset_table

    offs = central_offset_table(d)
    poly = lambda t: 0.3 * t**4 - t**3 + 2 * t**2 - 0.5 * t + 1.3
    dpoly = lambda t: 1.2 * t**3 - 3 * t**2 + 4 * t - 0.5
    ddpoly = lambda t: 3.6 * t**2 - 6 * t + 4

    for p in range(d):
        pts = x[p + offs[p]]
        fvals = poly(pts)
        for k, dfun in enumerate([dpoly, ddpoly]):
            row = np.asarray(w[0, p, k])  # 5 weights * h^k, then -h^k
            approx = row[:5] @ fvals
            # row encodes sum w f - h^k f^(k) = 0  ->  f^(k) = sum w f / h^k
            hk = -row[5]
            np.testing.assert_allclose(approx / hk, dfun(x[p]), rtol=1e-8, atol=1e-8)


def test_taylor_values():
    spec = make_spec((8,))
    steps = uniform_steps(spec)
    fv = stencil.taylor_values(spec, steps, forward=True)
    np.testing.assert_allclose(
        np.asarray(fv[0, :4]), [1.0, H, H * H / 2, -1.0], rtol=1e-15
    )
    bv = stencil.taylor_values(spec, steps, forward=False)
    np.testing.assert_allclose(
        np.asarray(bv[0, :4]), [1.0, -H, H * H / 2, -1.0], rtol=1e-15
    )


def test_initial_block_boxes():
    ivs = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
    ]
    spec = make_spec((6, 7), ivs=ivs)
    assert spec.n_init_rows == 6 + 5
    assert np.all(spec.init_values_static == 1.0)
    # first box: t=0 row, columns at points (0, 0..5), value var (mi 0)
    n_mi = spec.var_set.n_mi
    np.testing.assert_array_equal(spec.init_cols[:6], np.arange(6) * n_mi)


def test_render_rows_smoke():
    spec = make_spec((6, 6), ivs=[lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])])
    txt = render_rows(spec, "derivative", max_rows=2)
    assert "u(0, 0)" in txt and "u_x0(0, 0)" in txt
    txt = render_rows(spec, "initial", max_rows=1)
    assert txt.startswith("1.0*u(0, 0)")


def test_matvec_against_dense():
    """matvec/rmatvec/normal ops agree with an explicit dense matrix."""
    rng = np.random.default_rng(1)
    ivs = [lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])]
    spec = make_spec((6, 7), ivs=ivs)
    sys = PDESystem(spec)
    vals = jnp.asarray(rng.standard_normal(sys.n_entries))
    A = np.zeros((sys.n_rows, sys.num_vars))
    np.add.at(A, (np.asarray(sys.rows_all), np.asarray(sys.cols_all)), np.asarray(vals))
    x = rng.standard_normal(sys.num_vars)
    y = rng.standard_normal(sys.n_rows)
    np.testing.assert_allclose(np.asarray(sys.matvec(vals, jnp.asarray(x))), A @ x, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sys.rmatvec(vals, jnp.asarray(y))), A.T @ y, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sys.normal_matvec(vals, jnp.asarray(x))), A.T @ (A @ x), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sys.assemble_normal(vals)), A.T @ A, rtol=1e-10, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sys.normal_diag(vals)), np.diag(A.T @ A), rtol=1e-10
    )

"""Runtime constraint-value fills (pure differentiable JAX).

Derivative-constraint values are regenerated every forward pass from the
per-coordinate step vectors `steps_list[c]` of shape (bs, dim_c - 1), so
gradients flow from the constraint matrix back into learned step sizes by
ordinary autodiff.  5-point stencil weights for non-uniform steps come from
batched 5x5 Vandermonde solves (reference solve_5pt_central_stencil /
solve_5pt_stencil_edge, lp_pde_central_diff.py:1300-1492); forward/backward
Taylor values are (+-h)^k / k! chains (build_forward_values/_backward_values,
:1550-1615).

Value ordering matches ops/constraints.py exactly:
  derivative = [central | forward | backward], each looping
  coord -> grid point C-order -> derivative order -> stencil entries.

Note: for the one-sided edge stencils the reference indexes steps with an
off-by-one (solve_5pt_stencil_edge uses steps[p+1:p+5] for position p); this
is invisible for the uniform step vectors used by every reference workload.
We use the natural indexing steps[p:p+4].
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops.constraints import ConstraintSpec


def _stencil_distances(steps: jnp.ndarray, d: int) -> jnp.ndarray:
    """(bs, d, 5) signed distances from each grid position to its 5 stencil
    points, matching constraints.central_offset_table: one-sided ascending for
    positions {0, 1}, centered for [2, d-3], one-sided descending for
    {d-2, d-1}.  `steps` is (bs, d-1)."""
    bs = steps.shape[0]
    zero = jnp.zeros((bs, 1), dtype=steps.dtype)

    # left one-sided: x_j = cumsum of steps[p : p+4], prefixed by 0
    left = []
    for p in range(2):
        c = jnp.cumsum(steps[:, p : p + 4], axis=1)
        left.append(jnp.concatenate([zero, c], axis=1))
    left = jnp.stack(left, axis=1)  # (bs, 2, 5)

    # centered: [-h_{p-2}-h_{p-1}, -h_{p-1}, 0, h_p, h_p+h_{p+1}]
    hp2 = steps[:, 0 : d - 4]  # h_{p-2}
    hp1 = steps[:, 1 : d - 3]  # h_{p-1}
    hn1 = steps[:, 2 : d - 2]  # h_p
    hn2 = steps[:, 3 : d - 1]  # h_{p+1}
    center = jnp.stack(
        [-hp1 - hp2, -hp1, jnp.zeros_like(hn1), hn1, hn1 + hn2], axis=-1
    )  # (bs, d-4, 5)

    # right one-sided descending: x_j = -cumsum of steps[p-1 : p-5 : -1]
    right = []
    for p in (d - 2, d - 1):
        seg = steps[:, p - 4 : p]  # h_{p-4} .. h_{p-1}
        c = jnp.cumsum(seg[:, ::-1], axis=1)
        right.append(jnp.concatenate([zero, -c], axis=1))
    right = jnp.stack(right, axis=1)  # (bs, 2, 5)

    return jnp.concatenate([left, center, right], axis=1)  # (bs, d, 5)


def fornberg_weights(x: jnp.ndarray, n_deriv: int) -> jnp.ndarray:
    """Finite-difference weights at evaluation point 0 for arbitrarily spaced
    stencil points, via Fornberg's recursion (Fornberg 1988, "Generation of
    Finite Difference Formulas on Arbitrarily Spaced Grids").

    x: (..., p) distinct stencil point coordinates (relative to 0).
    Returns (..., p, n_deriv + 1) weights for derivative orders 0..n_deriv.

    Closed-form and differentiable — replaces the reference's batched 5x5
    Vandermonde `linalg.solve` (lp_pde_central_diff.py:1341,1422), which both
    squares the conditioning and fails to compile in f64 on TPU (no f64 LU).
    All loops are static and fully unrolled by the tracer.
    """
    p = x.shape[-1]
    zero = jnp.zeros_like(x[..., 0])
    # C[j][k]: weight of point j for derivative order k at the current stage
    C = [[None] * (n_deriv + 1) for _ in range(p)]
    C[0][0] = jnp.ones_like(zero)
    for j in range(p):
        for k in range(n_deriv + 1):
            if C[j][k] is None:
                C[j][k] = zero
    c1 = jnp.ones_like(zero)
    c4 = x[..., 0]
    for i in range(1, p):
        mn = min(i, n_deriv)
        c2 = jnp.ones_like(zero)
        c5 = c4
        c4 = x[..., i]
        for j in range(i):
            c3 = x[..., i] - x[..., j]
            c2 = c2 * c3
            if j == i - 1:
                for k in range(mn, 0, -1):
                    C[i][k] = c1 * (k * C[i - 1][k - 1] - c5 * C[i - 1][k]) / c2
                C[i][0] = -c1 * c5 * C[i - 1][0] / c2
            for k in range(mn, 0, -1):
                C[j][k] = (c4 * C[j][k] - k * C[j][k - 1]) / c3
            C[j][0] = c4 * C[j][0] / c3
        c1 = c2
    return jnp.stack(
        [jnp.stack([C[j][k] for k in range(n_deriv + 1)], axis=-1) for j in range(p)],
        axis=-2,
    )


def stencil_weights(steps: jnp.ndarray, d: int, order: int) -> jnp.ndarray:
    """4th-order 5-point derivative weights at every grid position.

    Returns (bs, d, n_cmi, 6): for derivative order k (1-based), entries
    [w_0..w_4 scaled by h^k, -h^k] where h is the local reference step, so the
    row reads  sum_j w_j u(x_j) - h^k * u^(k) = 0 scaled through by h^k
    (keeps magnitudes O(1); matches the reference scaling :1429-1430)."""
    x = _stencil_distances(steps, d)  # (bs, d, 5)
    n_cmi = order  # one stencil per derivative order 1..order
    w = fornberg_weights(x, order)[..., 1:]  # (bs, d, 5, order)
    # local scale h: steps[p] for p < d-1, steps[d-2] for the last position
    h = jnp.concatenate([steps, steps[:, -1:]], axis=1)  # (bs, d)
    out = []
    for k in range(n_cmi):
        hk = h ** (k + 1)  # (bs, d)
        entries = jnp.concatenate(
            [w[..., k] * hk[..., None], -hk[..., None]], axis=-1
        )  # (bs, d, 6)
        out.append(entries)
    return jnp.stack(out, axis=2)  # (bs, d, n_cmi, 6)


def _broadcast_over_grid(vals: jnp.ndarray, dims, coord: int) -> jnp.ndarray:
    """vals (bs, dims[coord], ...tail) -> (bs, *dims, ...tail) flattened to
    (bs, prod(dims) * prod(tail)), replicating over the other grid axes in
    C-order."""
    bs = vals.shape[0]
    tail = vals.shape[2:]
    shape = [bs] + [1] * len(dims) + list(tail)
    shape[1 + coord] = vals.shape[1]
    target = (bs,) + tuple(dims) + tail
    return jnp.broadcast_to(vals.reshape(shape), target).reshape(bs, -1)


def central_values(spec: ConstraintSpec, steps_list: Sequence[jnp.ndarray]):
    dims = spec.coord_dims
    parts = []
    for coord, steps in enumerate(steps_list):
        w = stencil_weights(steps, dims[coord], spec.order)  # (bs,d,n_cmi,6)
        parts.append(_broadcast_over_grid(w, dims, coord))
    return jnp.concatenate(parts, axis=1)


def taylor_values(spec: ConstraintSpec, steps_list, forward: bool):
    dims = spec.coord_dims
    order = spec.order
    # value row for step h: [h^0/0!, h^1/1!, (h^2/2!)], then -1 for neighbor
    parts = []
    for coord, steps in enumerate(steps_list):
        h = steps if forward else -steps  # (bs, d-1)
        cols = [jnp.ones_like(h), h]
        if order == 2:
            cols.append(h * h / 2.0)
        cols.append(-jnp.ones_like(h))
        vals = jnp.stack(cols, axis=-1)  # (bs, d-1, order+2)
        reduced = list(dims)
        reduced[coord] = dims[coord] - 1
        parts.append(_broadcast_over_grid(vals, tuple(reduced), coord))
    return jnp.concatenate(parts, axis=1)


def derivative_values(spec: ConstraintSpec, steps_list) -> jnp.ndarray:
    """(bs, n_deriv_entries) in [central | forward | backward] order."""
    cv = central_values(spec, steps_list)
    fv = taylor_values(spec, steps_list, forward=True)
    bv = taylor_values(spec, steps_list, forward=False)
    return jnp.concatenate([cv, fv, bv], axis=1)


def equation_values(spec: ConstraintSpec, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Crop a full coefficient grid (bs, grid, n_mi) to interior rows and
    flatten to the equation-entry order (interior point C-order x mi).
    Reference remove_pad (:1686-1705): time axis loses only its first slice;
    spatial axes lose both boundary slices."""
    dims = spec.coord_dims
    bs = coeffs.shape[0]
    x = coeffs.reshape((bs,) + dims + (spec.var_set.n_mi,))
    sl = [slice(None), slice(1, None)] + [slice(1, -1)] * (len(dims) - 1) + [slice(None)]
    return x[tuple(sl)].reshape(bs, -1)


def crop_rhs(spec: ConstraintSpec, rhs: jnp.ndarray) -> jnp.ndarray:
    """Crop a full rhs grid (bs, grid) to interior points (equation rows)."""
    dims = spec.coord_dims
    bs = rhs.shape[0]
    x = rhs.reshape((bs,) + dims)
    sl = [slice(None), slice(1, None)] + [slice(1, -1)] * (len(dims) - 1)
    return x[tuple(sl)].reshape(bs, -1)


def pad_rhs(spec: ConstraintSpec, vals: jnp.ndarray) -> jnp.ndarray:
    """Inverse of crop_rhs: scatter interior-row values back into a zero
    full grid (bs, grid) (reference add_pad :1632-1647)."""
    dims = spec.coord_dims
    bs = vals.shape[0]
    inner = [dims[0] - 1] + [d - 2 for d in dims[1:]]
    x = vals.reshape((bs,) + tuple(inner))
    pads = [(0, 0), (1, 0)] + [(1, 1)] * (len(dims) - 1)
    return jnp.pad(x, pads).reshape(bs, -1)

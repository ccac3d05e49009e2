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


def stencil_weights(steps: jnp.ndarray, d: int, order: int) -> jnp.ndarray:
    """Solve for 4th-order 5-point derivative weights at every position.

    Returns (bs, d, n_cmi, 6): for derivative order k (1-based), entries
    [w_0..w_4 scaled by h^k, -h^k] where h is the local reference step, so the
    row reads  sum_j w_j u(x_j) - h^k * u^(k) = 0 scaled through by h^k
    (keeps magnitudes O(1); matches the reference scaling :1429-1430)."""
    x = _stencil_distances(steps, d)  # (bs, d, 5)
    # Vandermonde system: M[i, j] = x_j^i, rhs columns e_1 (f') and 2 e_2 (f'')
    powers = jnp.stack([jnp.ones_like(x), x, x**2, x**3, x**4], axis=-2)
    n_cmi = order  # one stencil per derivative order 1..order
    b_cols = [jnp.array([0.0, 1, 0, 0, 0], dtype=x.dtype)]
    if order == 2:
        b_cols.append(jnp.array([0.0, 0, 2, 0, 0], dtype=x.dtype))
    b = jnp.stack(b_cols, axis=-1)  # (5, n_cmi)
    w = jnp.linalg.solve(powers, jnp.broadcast_to(b, powers.shape[:-2] + b.shape))
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

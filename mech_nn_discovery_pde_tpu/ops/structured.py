"""Gather-free structured matvec: A x as shifted-slice arithmetic.

The constraint matrix is a fixed-stencil operator; instead of indexing
(gather/scatter, which TPU executes poorly), every row family's action is a
weighted sum of *statically shifted slices* of the solution field
U = x.reshape(*dims, n_mi):

  equation rows    sum_mi c[p, mi] U[p or p-e_t, mi]    (interior crop;
                   evolution=True reads t-derivative mi at the previous
                   time step via one extra static shifted slice)
  initial rows     U[box, mi]                           (rectangular slices)
  central rows     sum_j w_j[p] U0[p + off_j e_c] - h^k U[p, mi_k]
                   with three static regions along coord c (left-edge
                   one-sided, interior centered, right-edge one-sided)
  Taylor rows      u + h u_c (+ h^2/2 u_cc) - u(next/prev)

All slices are static, so XLA fuses the whole matvec into vector code with
no dynamic indexing.  A^T y is derived with jax.linear_transpose (adjoint of
slicing = padding), keeping one source of truth.

Values are consumed in *structured layout* — exactly the intermediate grid
layouts ops/stencil.py produces before flattening — so fills provide both
views at no extra cost (see PDESystem.structured_values)."""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops.constraints import ConstraintSpec


class StructuredValues(NamedTuple):
    """Constraint values in grid layout (single sample).

    eq:      (d0-1, d1-2, ..., n_mi)   interior coefficients
    central: per coord, (d0, ..., dn-1, n_cmi, 6)
    fwd/bwd: per coord, (reduced dims, order + 2)
    """

    eq: jnp.ndarray
    init: jnp.ndarray
    central: List[jnp.ndarray]
    fwd: List[jnp.ndarray]
    bwd: List[jnp.ndarray]


def split_values(spec: ConstraintSpec, values: jnp.ndarray) -> StructuredValues:
    """Flat (n_entries,) value vector -> structured layout (single sample)."""
    vs = spec.var_set
    dims = spec.coord_dims
    n_mi = vs.n_mi
    n_cmi = spec.n_central_mi
    off = 0

    interior_shape = (dims[0] - 1,) + tuple(d - 2 for d in dims[1:])
    n_eq = int(np.prod(interior_shape)) * n_mi
    eq = values[off : off + n_eq].reshape(interior_shape + (n_mi,))
    off += n_eq
    n_init = spec.init_rows.shape[0]
    init = values[off : off + n_init]
    off += n_init

    central = []
    for c in range(len(dims)):
        n = int(np.prod(dims)) * n_cmi * 6
        central.append(values[off : off + n].reshape(dims + (n_cmi, 6)))
        off += n
    fwd, bwd = [], []
    terms = spec.order + 2
    for lst, _dir in ((fwd, +1), (bwd, -1)):
        for c in range(len(dims)):
            red = list(dims)
            red[c] -= 1
            n = int(np.prod(red)) * terms
            lst.append(values[off : off + n].reshape(tuple(red) + (terms,)))
            off += n
    assert off == values.shape[0]
    return StructuredValues(eq, init, central, fwd, bwd)


def _shift_slices(d: int):
    """Static slice triples along one axis: (region slice of the output,
    5-point neighbor offsets for that region)."""
    return [
        (slice(0, 2), (0, 1, 2, 3, 4)),
        (slice(2, d - 2), (-2, -1, 0, 1, 2)),
        (slice(d - 2, d), (0, -1, -2, -3, -4)),
    ]


def _take_shifted(U0: jnp.ndarray, axis: int, region: slice, off: int):
    """U0 sliced to `region` along `axis`, shifted by `off` (static)."""
    start = region.start + off
    stop = region.stop + off
    idx = [slice(None)] * U0.ndim
    idx[axis] = slice(start, stop)
    return U0[tuple(idx)]


def matvec_structured(
    spec: ConstraintSpec, sv: StructuredValues, x: jnp.ndarray
) -> jnp.ndarray:
    """A @ x -> (n_rows,), rows in [equation | initial | derivative] order."""
    vs = spec.var_set
    dims = spec.coord_dims
    n_mi = vs.n_mi
    n_cmi = spec.n_central_mi
    U = x.reshape(dims + (n_mi,))
    U0 = U[..., 0]

    parts = []

    # equation rows: interior crop, contract over mi.  evolution=True
    # redirects the time-derivative mi entries to the PREVIOUS time step
    # (reference build_equation_constraints :756-761): interior points have
    # t >= 1, so those entries read the statically shifted slice
    # U[0:-1, ...] instead of U[1:, ...] — still gather-free.
    sl = (slice(1, None),) + (slice(1, -1),) * (len(dims) - 1)
    if spec.evolution:
        w_prev = np.zeros(n_mi, dtype=np.float64)
        w_prev[vs.t_deriv_mi_indices] = 1.0
        w_same = 1.0 - w_prev
        sl_prev = (slice(0, -1),) + (slice(1, -1),) * (len(dims) - 1)
        eq_rows = jnp.sum(sv.eq * w_same * U[sl], axis=-1) + jnp.sum(
            sv.eq * w_prev * U[sl_prev], axis=-1
        )
        parts.append(eq_rows.reshape(-1))
    else:
        parts.append(jnp.sum(sv.eq * U[sl], axis=-1).reshape(-1))

    # initial rows: entries at box points (n_iv repeats); entry values are 1
    # in the real system but carried for generality
    off = 0
    for box in spec.iv_boxes:
        bsl = tuple(
            slice(int(b), int(e) + 1) for b, e in zip(box.begin, box.end)
        )
        vals = U[bsl + (box.mi_index,)].reshape(-1)
        if spec.n_iv > 1:
            vals = jnp.repeat(vals, spec.n_iv)
        n = vals.shape[0]
        parts.append(sv.init[off : off + n] * vals)
        off += n

    # central rows: per coord, per region, per stencil slot
    for c in range(len(dims)):
        w = sv.central[c]  # (dims..., n_cmi, 6)
        out = jnp.zeros(dims + (n_cmi,), x.dtype)
        for region, offs in _shift_slices(dims[c]):
            idx = [slice(None)] * len(dims)
            idx[c] = region
            idx = tuple(idx)
            acc = 0.0
            for j, off in enumerate(offs):
                acc = acc + w[idx + (slice(None), j)] * _take_shifted(
                    U0, c, region, off
                )[..., None]
            out = out.at[idx].set(acc)
        # derivative-variable entries (slot 5): mi = first/second partial
        for k in range(n_cmi):
            mi_idx = vs.central_mi_indices(c)[k]
            out = out.at[..., k].add(w[..., k, 5] * U[..., mi_idx])
        parts.append(out.reshape(-1))

    # Taylor rows: fwd then bwd, per coord
    for vals_list, sgn in ((sv.fwd, +1), (sv.bwd, -1)):
        for c in range(len(dims)):
            v = vals_list[c]  # (reduced dims, order+2)
            d = dims[c]
            base = [slice(None)] * len(dims)
            base[c] = slice(0, d - 1) if sgn > 0 else slice(1, d)
            base = tuple(base)
            nbr = [slice(None)] * len(dims)
            nbr[c] = slice(1, d) if sgn > 0 else slice(0, d - 1)
            nbr = tuple(nbr)
            acc = v[..., 0] * U0[base]
            acc = acc + v[..., 1] * U[base + (vs.first_deriv_index(c),)]
            t = 2
            if spec.order == 2:
                acc = acc + v[..., 2] * U[base + (vs.second_deriv_index(c),)]
                t = 3
            acc = acc + v[..., t] * U0[nbr]
            parts.append(acc.reshape(-1))

    return jnp.concatenate(parts)


def make_structured_ops(spec: ConstraintSpec, dtype):
    """(matvec, rmatvec) closures over a StructuredValues pytree.

    rmatvec is the exact linear transpose of matvec (adjoint slicing =
    padding), generated by jax.linear_transpose."""

    num_vars = spec.var_set.num_vars

    def mv(sv, x):
        return matvec_structured(spec, sv, x)

    def rmv(sv, y):
        lt = jax.linear_transpose(lambda x: mv(sv, x), jnp.zeros((num_vars,), dtype))
        return lt(y)[0]

    return mv, rmv

"""Spatially-sharded application of the assembled normal operator.

Shards grid axis 0 (time) over the mesh's 'sp' axis and applies the
block-stencil AtA (ops/normal_stencil.py) with explicit halo exchange over
ICI (shard_map + ppermute) — the scaling path for single patches that
outgrow one chip (SURVEY 5.7/5.8; the reference is single-GPU and has no
equivalent).

Why this is cheap: every AtA coupling is axis-aligned with offset <= 4, so
only couplings along the sharded axis cross shard boundaries, and they reach
at most 4 grid planes.  Two further structural facts make the apply fully
local after one exchange of x:

1. Couplings along NON-sharded axes never cross shards: a flat shift by
   s < stride_0 only wraps across axis-0 planes at positions where the
   band coefficient is structurally ZERO (the zero-padding that already
   makes the single-chip flat-shift apply wraparound-safe).
2. The symmetric band application y[q+s] += g[q] x[q] would write into a
   NEIGHBOR's rows; instead of remote accumulation we read the reversed
   band locally: y[p] += g[p-s] x[p-s], with g[p-s] coming from a halo of
   the COEFFICIENT fields.  Coefficients are fixed for the whole solve, so
   their halo is exchanged ONCE per solve (extend_coef) and every matvec
   exchanges only the m solution channels.

Per-matvec communication: 2 * HALO * (prod(dims[1:]) * n_mi) elements per
shard boundary — O(surface), while compute is O(volume).
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
    NormalStencilDesc,
    _band_channels,
)

HALO = 4  # max axis offset in AtA (one-sided 5-point edge stencils)


def _exchange_halo_ax1(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(C, n_loc, R) -> (C, n_loc + 2*HALO, R): neighbors' edge planes along
    axis 1; zero-filled at the global ends."""
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_left = jax.lax.ppermute(x[:, -HALO:], axis_name, fwd)
    from_right = jax.lax.ppermute(x[:, :HALO], axis_name, bwd)
    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n_shards - 1, zero, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def make_sharded_normal_ops(mesh: Mesh, desc: NormalStencilDesc, sp_axis: str = "sp"):
    """(extend_coef, apply) for the sharded stencil normal matvec.

    Global layouts (single sample):
      coef  (NC, d0, R)           R = prod(dims[1:]);  sharded P(None, sp, None)
      x     (m, d0, R)            sharded P(None, sp, None)
      coef_h = extend_coef(coef)  opaque haloed handle, exchange once per solve
      y = apply(coef_h, x)        same sharding as x

    Helpers to convert from the flat (num_vars,) vector layout:
      x3 = x.reshape(d0, R, m) -> transpose (2, 0, 1); inverse for y.
    """
    dims = desc.coord_dims
    d0 = dims[0]
    R = int(np.prod(dims[1:])) if len(dims) > 1 else 1
    m = desc.n_mi
    NC = desc.n_channels
    n_sp = mesh.shape[sp_axis]
    assert d0 % n_sp == 0, (d0, n_sp)
    n_loc = d0 // n_sp
    assert n_loc >= HALO, (
        f"each shard must hold >= {HALO} planes of the sharded axis "
        f"(got {n_loc}); use fewer shards or a larger grid"
    )
    I = HALO * R  # interior offset in the haloed flat layout
    L = n_loc * R

    @partial(shard_map, mesh=mesh, in_specs=P(None, sp_axis, None),
             out_specs=P(None, sp_axis, None))
    def extend_coef(coef):
        return _exchange_halo_ax1(coef, sp_axis)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, sp_axis, None), P(None, sp_axis, None)),
             out_specs=P(None, sp_axis, None))
    def apply(coef_h, x):
        xh = _exchange_halo_ax1(x, sp_axis)
        gf = coef_h.reshape(NC, (n_loc + 2 * HALO) * R)
        xf = xh.reshape(m, (n_loc + 2 * HALO) * R)
        # dense offset-0 block on the interior
        ys = []
        for i in range(m):
            acc = gf[i * m, I : I + L] * xf[0, I : I + L]
            for j in range(1, m):
                acc = acc + gf[i * m + j, I : I + L] * xf[j, I : I + L]
            ys.append(acc)
        # bands: forward read + reversed read (no remote writes)
        for b in desc.bands:
            s = b.stride
            ci, cj = _band_channels(b)
            # y_i[p] += g[p] x_j[p+s]
            ys[ci] = ys[ci] + gf[b.ch, I : I + L] * xf[cj, I + s : I + s + L]
            # y_j[p] += g[p-s] x_i[p-s]
            ys[cj] = ys[cj] + gf[b.ch, I - s : I - s + L] * xf[ci, I - s : I - s + L]
        return jnp.stack(ys, axis=0).reshape(m, n_loc, R)

    return extend_coef, apply


def to_channel_major_grid(desc: NormalStencilDesc, x: jnp.ndarray) -> jnp.ndarray:
    """(num_vars,) -> (m, d0, R)."""
    dims = desc.coord_dims
    d0 = dims[0]
    R = int(np.prod(dims[1:])) if len(dims) > 1 else 1
    return x.reshape(d0, R, desc.n_mi).transpose(2, 0, 1)


def from_channel_major_grid(desc: NormalStencilDesc, y: jnp.ndarray) -> jnp.ndarray:
    """(m, d0, R) -> (num_vars,)."""
    return y.transpose(1, 2, 0).reshape(-1)


def coef_to_grid(desc: NormalStencilDesc, coef: jnp.ndarray) -> jnp.ndarray:
    """(NC, grid_size) -> (NC, d0, R)."""
    dims = desc.coord_dims
    d0 = dims[0]
    R = int(np.prod(dims[1:])) if len(dims) > 1 else 1
    return coef.reshape(desc.n_channels, d0, R)

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


def _exchange_halo_axis(x: jnp.ndarray, axis: int, axis_name: str) -> jnp.ndarray:
    """Neighbor halo exchange along `axis` (HALO planes each side, zero at
    the global ends) — the any-rank generalization of _exchange_halo_ax1."""
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    take = lambda sl: jax.lax.slice_in_dim(x, sl.start, sl.stop, axis=axis)
    n = x.shape[axis]
    from_left = jax.lax.ppermute(take(slice(n - HALO, n)), axis_name, fwd)
    from_right = jax.lax.ppermute(take(slice(0, HALO)), axis_name, bwd)
    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n_shards - 1, zero, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def make_sharded_flat_ops(mesh: Mesh, desc: NormalStencilDesc, sp_axis: str = "sp"):
    """(extend_flat, apply_flat) on the solver's FLAT vector interfaces,
    vmap-safe — the integration shim that lets MultigridSolver's per-sample
    code call the explicitly-sharded stencil apply from inside jax.vmap
    (shard_map cannot appear under vmap, so batching is rerouted through a
    custom_vmap rule into ONE shard_map over the batched layout).

      coef   (NC, grid_size)         -> coef_h (NC, d0 + 2*HALO, R)  [opaque]
      x      (num_vars,)             -> y (num_vars,)

    extend_flat exchanges the coefficient halo ONCE per solve; apply_flat
    exchanges only the m solution channels per matvec (O(surface) comms).
    Batched layouts keep the batch axis replicated inside the shard_map —
    the sp path targets few-sample giant patches (compose dp outside by
    sharding the batch axis of the SURROUNDING jit; XLA reshards at the
    shard_map boundary)."""
    from jax import custom_batching

    dims = desc.coord_dims
    d0 = dims[0]
    R = int(np.prod(dims[1:])) if len(dims) > 1 else 1
    m, NC = desc.n_mi, desc.n_channels
    n_sp = mesh.shape[sp_axis]
    assert d0 % n_sp == 0, (d0, n_sp)
    n_loc = d0 // n_sp
    assert n_loc >= HALO, (
        f"each shard must hold >= {HALO} planes of grid axis 0 "
        f"(got {n_loc}); use fewer 'sp' shards or a larger grid"
    )
    I, L = HALO * R, n_loc * R

    def _local_apply(coef_h, xh):
        """(NC, n_loc+2H, R), (m, n_loc+2H, R) -> (m, n_loc, R)."""
        gf = coef_h.reshape(NC, -1)
        xf = xh.reshape(m, -1)
        ys = []
        for i in range(m):
            acc = gf[i * m, I : I + L] * xf[0, I : I + L]
            for j in range(1, m):
                acc = acc + gf[i * m + j, I : I + L] * xf[j, I : I + L]
            ys.append(acc)
        for b in desc.bands:
            s = b.stride
            ci, cj = _band_channels(b)
            ys[ci] = ys[ci] + gf[b.ch, I : I + L] * xf[cj, I + s : I + s + L]
            ys[cj] = ys[cj] + gf[b.ch, I - s : I - s + L] * xf[ci, I - s : I - s + L]
        return jnp.stack(ys, axis=0).reshape(m, n_loc, R)

    # ---- extend (coef halo, once per solve) ----------------------------

    @custom_batching.custom_vmap
    def extend_flat(coef):
        @partial(shard_map, mesh=mesh, in_specs=P(None, sp_axis, None),
                 out_specs=P(None, sp_axis, None))
        def ext(c3):
            return _exchange_halo_axis(c3, 1, sp_axis)

        return ext(coef.reshape(NC, d0, R))

    @extend_flat.def_vmap
    def _extend_vmap(axis_size, in_batched, coef):
        @partial(shard_map, mesh=mesh, in_specs=P(None, None, sp_axis, None),
                 out_specs=P(None, None, sp_axis, None))
        def ext(c4):
            return _exchange_halo_axis(c4, 2, sp_axis)

        return ext(coef.reshape(axis_size, NC, d0, R)), True

    # ---- apply (per matvec) --------------------------------------------

    @custom_batching.custom_vmap
    def apply_flat(coef_h, x):
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, sp_axis, None), P(None, sp_axis, None)),
                 out_specs=P(None, sp_axis, None))
        def app(c3, x3):
            xh = _exchange_halo_axis(x3, 1, sp_axis)
            return _local_apply(c3, xh)

        x3 = x.reshape(d0, R, m).transpose(2, 0, 1)
        y3 = app(coef_h, x3)
        return y3.transpose(1, 2, 0).reshape(-1)

    @apply_flat.def_vmap
    def _apply_vmap(axis_size, in_batched, coef_h, x):
        coef_b, x_b = in_batched
        if not coef_b:
            coef_h = jnp.broadcast_to(coef_h, (axis_size,) + coef_h.shape)
        if not x_b:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(None, None, sp_axis, None),
                           P(None, None, sp_axis, None)),
                 out_specs=P(None, None, sp_axis, None))
        def app(c4, x4):
            xh = _exchange_halo_axis(x4, 2, sp_axis)
            return jax.vmap(_local_apply)(c4, xh)

        x4 = x.reshape(axis_size, d0, R, m).transpose(0, 3, 1, 2)
        y4 = app(coef_h, x4)
        return y4.transpose(0, 2, 3, 1).reshape(axis_size, -1), True

    return extend_flat, apply_flat


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

"""Explicit halo-exchange stencil application on spatially sharded grids.

For very large grids (the reference's long-sequence analogue is patch
decomposition + multigrid, SURVEY 5.7) a single patch can outgrow one chip;
the TPU answer is to shard a grid axis over the mesh's 'sp' axis and
exchange 2-deep halos (the 5-point stencils reach +-2, edge stencils +-4
but only within the first/last 2 positions of the *global* axis, which live
on the first/last shard — so interior exchanges stay 2-deep when each shard
holds >= 4 points... we exchange 4 to cover every case).

Implemented with shard_map + ppermute (neighbor exchange over ICI), which is
also the communication pattern Krylov dot-products (psum) compose with.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

HALO = 4


def _exchange_halo(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Concatenate neighbors' edge slabs around the local block along axis 0.

    x: (local_n, ...) -> (HALO + local_n + HALO, ...); out-of-range halos
    (global edges) are zero-filled."""
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_src = [(i, (i + 1) % n_shards) for i in range(n_shards)]  # i sends to i+1
    right_src = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_left = jax.lax.ppermute(x[-HALO:], axis_name, left_src)
    from_right = jax.lax.ppermute(x[:HALO], axis_name, right_src)
    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n_shards - 1, zero, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=0)


def sharded_stencil_apply(
    mesh: Mesh,
    fn_local: Callable[[jnp.ndarray], jnp.ndarray],
    sp_axis: str = "sp",
):
    """Wrap a halo-consuming local function into a shard_map over `sp_axis`.

    fn_local receives the local block with HALO ghost rows on both sides of
    axis 0 and must return an output of the local (unhaloed) extent."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(sp_axis),
        out_specs=P(sp_axis),
    )
    def apply(x):
        return fn_local(_exchange_halo(x, sp_axis))

    return apply


def sharded_axis_derivative(mesh: Mesh, weights_5pt, sp_axis: str = "sp"):
    """Example/production kernel: 4th-order 5-point first-derivative along a
    sharded axis 0.  `weights_5pt` is the (5,) uniform-step weight row
    (interior points only; callers handle global edges separately)."""
    w = jnp.asarray(weights_5pt)

    def local(xh):
        # xh: (HALO + n + HALO, ...); interior output i uses xh[i+HALO-2 .. i+HALO+2]
        n = xh.shape[0] - 2 * HALO
        out = jnp.zeros_like(xh[HALO : HALO + n])
        for k in range(5):
            out = out + w[k] * jax.lax.dynamic_slice_in_dim(xh, HALO - 2 + k, n, 0)
        return out

    return sharded_stencil_apply(mesh, local, sp_axis)

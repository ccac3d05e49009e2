"""Device mesh + sharding helpers.

The reference is single-GPU with no distributed backend (SURVEY 2,
"Parallelism strategies"); the TPU-native scaling model is jax.sharding over
a device Mesh with XLA-inserted collectives over ICI:

- 'dp'  axis: batch (patch) parallelism — every solver in this framework is
  vmapped over the batch, so sharding the leading axis splits whole KKT
  solves across chips with zero communication in the solve itself and a
  single psum for the loss/grad reduction (inserted by XLA under jit).
- 'sp'  axis: spatial parallelism — grid axes of fields (and the conv
  ResNet activations) are sharded; XLA GSPMD partitions the convolutions and
  stencil gathers with halo exchanges / collective permutes.  An explicit
  shard_map halo-exchange stencil kernel lives in parallel/halo.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("dp", "sp"),
    devices=None,
) -> Mesh:
    """Create a Mesh over all (or given) devices.  Default shape puts every
    device on 'dp' ((n, 1) for two axes)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis of an ndim-array over `axis`."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(mesh: Mesh, tree, axis: str = "dp"):
    """Device-put a pytree of arrays with the leading axis sharded over
    `axis` (arrays whose leading dim doesn't divide are replicated)."""
    dp = mesh.shape[axis]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
        return jax.device_put(x, replicate(mesh))

    return jax.tree.map(put, tree)

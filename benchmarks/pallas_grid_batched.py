"""Measured-and-rejected grid-batched Pallas stencil apply.

Kept out of the package: per CLAUDE.md and the round-2 measurements,
grid+BlockSpec pallas_call forms of the stencil body fail server-side
through the axon remote Mosaic compiler (HTTP 500 / >13 min compile hang),
so this variant cannot be wired into MultigridSolver as-is.  It is the
natural single-launch form (one grid step per sample, whole sample in
VMEM) and should be retried if the tunnel's Mosaic path improves —
expected ~15x over the lax.map-of-single-sample batching, which is
launch-bound at ~80 us/kernel.

Usage: python benchmarks/pallas_grid_batched.py  (CPU interpret check)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
    NormalStencilDesc,
    _stencil_kernel_body,
)


def _round_up(v: int, m_: int) -> int:
    return ((v + m_ - 1) // m_) * m_


def pallas_apply_batched(
    desc: NormalStencilDesc, coef: jnp.ndarray, X: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grid-batched pallas_call: coef (bs, NC, N), X (bs, m, N) -> (bs, m, N).

    One grid step per sample; each step holds the whole sample in VMEM.
    The batch is flattened into ROWS ((bs*NCp, Np) etc.) so each block is a
    clean 2D (NCp, Np) window — identical in shape to the known-compiling
    single-sample kernel.  Blocked pallas lowering requires the trailing
    block dims to be (8, 128)-divisible, so channels pad to a sublane
    multiple and the flat grid pads to a lane multiple; the zero padding is
    harmless by the same argument that makes the flat-shift apply
    wraparound-safe."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bs = coef.shape[0]
    m, N = desc.n_mi, desc.grid_size
    NC = desc.n_channels
    NCp = _round_up(NC, 8)
    mp = _round_up(m, 8)
    Np = _round_up(N, 128)

    coef_p = jnp.zeros((bs, NCp, Np), coef.dtype)
    coef_p = coef_p.at[:, :NC, :N].set(coef)
    X_p = jnp.zeros((bs, mp, Np), X.dtype)
    X_p = X_p.at[:, :m, :N].set(X)

    def kernel(coef_ref, x_ref, y_ref):
        _stencil_kernel_body(desc, coef_ref, x_ref, y_ref)
        for i in range(m, mp):  # zero the padding rows (never written above)
            y_ref[i, :] = jnp.zeros((Np,), X.dtype)

    y = pl.pallas_call(
        kernel,
        grid=(bs,),
        out_shape=jax.ShapeDtypeStruct((bs * mp, Np), X.dtype),
        in_specs=[
            pl.BlockSpec((NCp, Np), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, Np), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, Np), lambda b: (b, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coef_p.reshape(bs * NCp, Np), X_p.reshape(bs * mp, Np))
    return y.reshape(bs, mp, Np)[:, :m, :N]


if __name__ == "__main__":
    import numpy as np

    from mech_nn_discovery_pde_tpu.ops.normal_stencil import make_normal_stencil_ops
    from mech_nn_discovery_pde_tpu.ops.structured import split_values
    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    jax.config.update("jax_platforms", "cpu")
    sys_ = PDESystem.build((6, 8), order=2, init_index_mi_list=[
        lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])
    ])
    desc, build, apply_ = make_normal_stencil_ops(sys_.spec)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(3, sys_.n_entries)), jnp.float32)
    coef = jax.vmap(lambda v: build(split_values(sys_.spec, v)))(vals)
    x = jnp.asarray(rng.normal(size=(3, sys_.num_vars)), jnp.float32)
    ref = jax.vmap(apply_)(coef, x)
    m, N = desc.n_mi, desc.grid_size
    X = jnp.swapaxes(x.reshape(3, N, m), 1, 2)
    got = pallas_apply_batched(desc, coef, X, interpret=True)
    got = jnp.swapaxes(got, 1, 2).reshape(3, -1)
    err = float(jnp.max(jnp.abs(got - ref)))
    print("grid-batched pallas vs XLA apply max err:", err)
    assert err < 1e-4  # f32, value scale O(100): a few ulp

"""Fused Pallas Chebyshev smoother: the whole multi-step smoothing pass of
one sample runs in a single TPU kernel with every operand VMEM-resident.

Motivation (VALIDATION.md round-3): the XLA smoother re-reads the stored
preconditioner operators from HBM on EVERY Chebyshev step — per fine-level
GL step that is 10 x (binv ~12.8 MB + coef ~4.3 MB) per sample per
smoothing pass, and the V-cycle dominates the training step.  Fusing the
pass reads binv/coef ONCE and keeps the iteration vectors on-chip, cutting
smoother HBM traffic ~10x.  With bf16-stored operators
(config.mg_precond_dtype='bf16') the GL fine level needs ~10 MB of VMEM,
under the ~16 MB/core budget; f32 operators fit the coarser levels.

Replaces the hot loop of MultigridSolver._smooth (solvers/multigrid.py);
the reference's analogue is the CuPy Gauss-Seidel sweep driven from Python
(reference solver/multigrid.py:233-239,399-405).

Kernel layout: vectors are (m, nt, S) channel-major views of the flat
(N*m,) solver vectors (N = nt*S grid points in C-order, S = spatial size).
Band MACs use the structural-zero wraparound property of the assembled
stencil (see ops/normal_stencil.normal_stencil_matvec): a spatial-coord
band's flat slice may cross t-rows only where its coefficient is zero, so
per-row shifted slices are exact.  The line-block Jacobi apply runs as a
fori_loop over the bw = nt*m block rows with the inverse stored
transposed as (bw, bw, S) so each MAC is a lane-parallel vector op.

Batching: pallas_call under vmap does not compile through the axon tunnel
(CLAUDE.md), so the public entry is a jax.custom_batching.custom_vmap that
lowers batched calls to lax.map over the single-sample kernel, like
ops/normal_stencil.normal_stencil_matvec_pallas.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
    NormalStencilDesc,
    _band_channels,
)


def _emit_stencil_apply(desc: NormalStencilDesc, nt: int, S: int, coef, X):
    """y = (AtA) X on (m, nt, S) VALUES; coef (NC, nt, S) f32 values.

    Mirrors ops/normal_stencil._stencil_kernel_body, restructured for the
    (nt, S) grid view so it can run on loaded values inside the fused
    kernel (no ref mutation needed for intermediates)."""
    m = desc.n_mi
    # dense offset-0 block
    ys = []
    for i in range(m):
        acc = coef[i * m] * X[0]
        for j in range(1, m):
            acc = acc + coef[i * m + j] * X[j]
        ys.append(acc)
    # axis bands, symmetric.  Circular rolls instead of sliced updates:
    # Mosaic lowers neither scatter-add (sliced .add) nor the scatter that
    # sliced .set falls back to, but static rolls are concatenations of
    # slices.  Wraparound is exact because the stored band coefficient g is
    # structurally ZERO wherever the +stride neighbor does not exist (the
    # same property the production rolled apply uses —
    # ops/normal_stencil.normal_stencil_matvec).
    for b in desc.bands:
        ci, cj = _band_channels(b)
        g = coef[b.ch]
        if b.coord == 0:
            d = b.stride // S
            # y[ci] += g * x[cj] shifted by -d in t   (g zero at t >= nt-d)
            ys[ci] = ys[ci] + g * jnp.roll(X[cj], -d, axis=0)
            ys[cj] = ys[cj] + jnp.roll(g * X[ci], d, axis=0)
        else:
            s = b.stride  # < S; cross-row wrap has zero coef
            ys[ci] = ys[ci] + g * jnp.roll(X[cj], -s, axis=1)
            ys[cj] = ys[cj] + jnp.roll(g * X[ci], s, axis=1)
    return jnp.stack(ys)


def _emit_block_apply(nt: int, m: int, S: int, binv_t_ref, r, t1_ref):
    """t1 = B^{-1} r (time-line block Jacobi) via fori over block rows.

    binv_t_ref: (bw, bw, S) ref (possibly bf16), r: (m, nt, S) value,
    t1_ref: (m, nt, S) scratch ref receiving the result."""
    import jax.experimental.pallas as pl

    bw = nt * m

    def body(row, _):
        # lax.div/rem, not // and %: jnp.floor_divide's sign-correction
        # lowers a 64-bit convert under x64, which Mosaic rejects
        # ("64-bit types are not supported"); row >= 0 so they agree.
        ti = jax.lax.div(row, jnp.int32(m))
        mi = jax.lax.rem(row, jnp.int32(m))
        brow = binv_t_ref[row].astype(jnp.float32)  # (bw, S)
        acc = brow[0] * r[0, 0]
        for j in range(1, bw):
            acc = acc + brow[j] * r[j % m, j // m]
        t1_ref[pl.ds(mi, 1), pl.ds(ti, 1), :] = acc[None, None]
        return 0

    # int32 bounds: under x64, Python-int bounds make the loop index int64,
    # which Mosaic cannot lower
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(bw), body, 0)


def _fused_chebyshev_kernel(
    desc: NormalStencilDesc,
    nt: int,
    S: int,
    steps: int,
    ratio: float,
    x0_zero: bool,
    coef_ref,
    binv_t_ref,
    b_ref,
    x0_ref,
    lmax_ref,
    out_ref,
    t1_ref,
):
    """One sample, `steps` Chebyshev iterations, everything VMEM-resident.

    Recurrence identical to MultigridSolver._smooth (Chebyshev on the
    block-preconditioned operator over [lmax/ratio, lmax])."""
    m = desc.n_mi
    coef = coef_ref[...].astype(jnp.float32)
    b = b_ref[...]
    lmax = lmax_ref[0, 0]
    lmin = lmax / ratio
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma = theta / delta
    rho = 1.0 / sigma

    if x0_zero:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0_ref[...]
        r = b - _emit_stencil_apply(desc, nt, S, coef, x)
    _emit_block_apply(nt, m, S, binv_t_ref, r, t1_ref)
    d = t1_ref[...] / theta
    for _ in range(steps):
        x = x + d
        r = r - _emit_stencil_apply(desc, nt, S, coef, d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        _emit_block_apply(nt, m, S, binv_t_ref, r, t1_ref)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * t1_ref[...]
        rho = rho_new
    out_ref[...] = x


def _fused_single(desc, nt, S, steps, ratio, x0_zero, interpret,
                  coef3, binv_t, B, X0, lmax11):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = desc.n_mi
    kern = partial(_fused_chebyshev_kernel, desc, nt, S, steps, ratio, x0_zero)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, nt, S), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, nt, S), jnp.float32)],
        interpret=interpret,
    )(coef3, binv_t, B, X0, lmax11)


def make_fused_smoother(
    desc: NormalStencilDesc,
    dims: Tuple[int, ...],
    steps: int,
    ratio: float,
    x0_zero: bool,
    interpret: bool = False,
):
    """Returns smooth(coef, binv_t, b, x0, lmax) -> x for ONE sample.

    coef: (NC, N) stored dtype; binv_t: (bw, bw, S) stored dtype;
    b, x0: flat (N*m,) f32; lmax: scalar f32.  Batched calls lower to
    lax.map over samples (vmap of pallas_call fails through the axon
    tunnel; single-sample whole-array kernels compile)."""
    m = desc.n_mi
    nt, S = dims[0], int(np.prod(dims[1:]))
    assert nt * S == desc.grid_size

    @jax.custom_batching.custom_vmap
    def smooth(coef, binv_t, b, x0, lmax):
        ipt = interpret or jax.default_backend() == "cpu"
        coef3 = coef.reshape(-1, nt, S)
        B = b.reshape(nt, S, m).transpose(2, 0, 1).astype(jnp.float32)
        X0 = x0.reshape(nt, S, m).transpose(2, 0, 1).astype(jnp.float32)
        lmax11 = jnp.asarray(lmax, jnp.float32).reshape(1, 1)
        Y = _fused_single(desc, nt, S, steps, ratio, x0_zero, ipt,
                          coef3, binv_t, B, X0, lmax11)
        return Y.transpose(1, 2, 0).reshape(-1).astype(b.dtype)

    @smooth.def_vmap
    def _smooth_vmap(axis_size, in_batched, *args):
        args_b = tuple(
            a if bat else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, bat in zip(args, in_batched)
        )
        out = jax.lax.map(lambda t: smooth(*t), args_b)
        return out, True

    return smooth

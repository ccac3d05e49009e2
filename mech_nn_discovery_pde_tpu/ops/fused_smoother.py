"""Fused Pallas Chebyshev smoother: the whole multi-step smoothing pass of
one sample runs in a single TPU kernel with every operand VMEM-resident.

Motivation (VALIDATION.md round-3): the XLA smoother re-reads the stored
preconditioner operators from HBM on EVERY Chebyshev step — per fine-level
GL step that is 10 x (binv ~12.8 MB + coef ~4.3 MB) per sample per
smoothing pass, and the V-cycle dominates the training step.  Fusing the
pass reads binv/coef ONCE and keeps the iteration vectors on-chip, cutting
smoother HBM traffic ~10x.  The GL fine level exceeds the ~16 MB/core VMEM
budget at f32; the production fit is mg_precond_dtype='bf16_factored'
(W = chol-factor of B^-1 stored bf16 ~6.4 MB + coef f32 ~4.3 MB), which
keeps f32-level quality because round(W) round(W)^T stays PSD — all-bf16
storage ('bf16') collapses the preconditioner at this scale
(benchmarks/bf16_mixed_diag.py).  f32 operators fit the coarser levels.

Replaces the hot loop of MultigridSolver._smooth (solvers/multigrid.py);
the reference's analogue is the CuPy Gauss-Seidel sweep driven from Python
(reference solver/multigrid.py:233-239,399-405).

Kernel layout: vectors are (m, nt, S) channel-major views of the flat
(N*m,) solver vectors (N = nt*S grid points in C-order, S = spatial size).
Band MACs use the structural-zero wraparound property of the assembled
stencil (see ops/normal_stencil.normal_stencil_matvec): a spatial-coord
band's flat slice may cross t-rows only where its coefficient is zero, so
per-row shifted slices are exact.  The line-block Jacobi apply is fully
static: unrolled over the bw = nt*m block columns with the inverse stored
column-major as (bw, m, nt, S), so each term is one whole-tensor
lane-parallel MAC (no dynamic indexing, no scratch).

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


def _emit_block_apply(nt: int, m: int, S: int, winv_ref, r):
    """t1 = B^{-1} r (time-line block Jacobi), fully static.

    winv_ref: (bw, m, nt, S) ref (possibly bf16) holding the block inverse
    COLUMN-major — winv[j][mi, ti, s] = B^{-1}_s[ti*m+mi, j]; r: (m, nt, S)
    value.  Unrolled over the bw = nt*m block columns, each term one
    whole-tensor MAC with a lane-broadcast row of r.  This form uses no
    dynamic indexing and no scratch (the previous fori + dynamic-sublane
    store form is the construct server-side Mosaic compiles are most likely
    to reject, and it issued ~bw x more, narrower vector ops)."""
    bw = nt * m
    acc = winv_ref[0].astype(jnp.float32) * r[0, 0]
    for j in range(1, bw):
        acc = acc + winv_ref[j].astype(jnp.float32) * r[j % m, j // m]
    return acc


def _emit_factored_block_apply(nt: int, m: int, S: int, w_ref, r):
    """t1 = W (W^T r) for mg_precond_dtype='bf16_factored', fully static.

    w_ref: (bw, m, nt, S) ref (bf16) holding the PSD square-root factor W
    (B^-1 = W W^T) in the SAME column-major layout as _emit_block_apply —
    w[j][mi, ti, s] = W_s[ti*m+mi, j].  Pass 1 reduces u_j = sum_i W[i,j]
    r_i (one whole-tensor multiply + (m, nt) reduction per column, result
    (S,) lane vectors); pass 2 is the same MAC unroll as the inverse apply
    with u_j lane-broadcast.  round(W) round(W)^T is PSD by construction,
    which is why factored bf16 storage keeps f32-level smoother quality
    while the entrywise-rounded inverse goes indefinite
    (benchmarks/bf16_mixed_diag.py)."""
    bw = nt * m
    # two passes over the stored columns; each pass RE-READS w_ref[j] so at
    # most one f32-cast column is live at a time (keeping all bw cast
    # columns live would add ~bw*m*nt*S*4 bytes of VMEM intermediates)
    us = [jnp.sum(w_ref[j].astype(jnp.float32) * r, axis=(0, 1))
          for j in range(bw)]  # each (S,)
    acc = w_ref[0].astype(jnp.float32) * us[0][None, None, :]
    for j in range(1, bw):
        acc = acc + w_ref[j].astype(jnp.float32) * us[j][None, None, :]
    return acc


def _fused_chebyshev_kernel(
    desc: NormalStencilDesc,
    nt: int,
    S: int,
    steps: int,
    ratio: float,
    x0_zero: bool,
    emit_residual: bool,
    factored: bool,
    coef_ref,
    binv_t_ref,
    b_ref,
    x0_ref,
    lmax_ref,
    out_ref,
    res_ref=None,
):
    """One sample, `steps` Chebyshev iterations, everything VMEM-resident.

    Recurrence identical to MultigridSolver._smooth (Chebyshev on the
    block-preconditioned operator over [lmax/ratio, lmax]).

    emit_residual: the recurrence maintains r = b - A x as a loop invariant
    (r is updated by -A d right after every x += d), so the final residual
    the V-cycle needs for restriction is already on-chip — emitting it as a
    second output saves the V-cycle's whole separate fine-level apply
    (b - A x through HBM) at ZERO extra flops."""
    m = desc.n_mi
    block_apply = (_emit_factored_block_apply if factored
                   else _emit_block_apply)
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
    d = block_apply(nt, m, S, binv_t_ref, r) / theta
    for _ in range(steps):
        x = x + d
        r = r - _emit_stencil_apply(desc, nt, S, coef, d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        t1 = block_apply(nt, m, S, binv_t_ref, r)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * t1
        rho = rho_new
    out_ref[...] = x
    if emit_residual:
        res_ref[...] = r


def _fused_single(desc, nt, S, steps, ratio, x0_zero, emit_residual,
                  factored, interpret, coef3, binv_t, B, X0, lmax11):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = desc.n_mi
    kern = partial(_fused_chebyshev_kernel, desc, nt, S, steps, ratio,
                   x0_zero, emit_residual, factored)
    shp = jax.ShapeDtypeStruct((m, nt, S), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=(shp, shp) if emit_residual else shp,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            (pl.BlockSpec(memory_space=pltpu.VMEM),) * 2
            if emit_residual else pl.BlockSpec(memory_space=pltpu.VMEM)
        ),
        interpret=interpret,
    )(coef3, binv_t, B, X0, lmax11)


def make_fused_smoother(
    desc: NormalStencilDesc,
    dims: Tuple[int, ...],
    steps: int,
    ratio: float,
    x0_zero: bool,
    interpret: bool = False,
    emit_residual: bool = False,
    factored: bool = False,
):
    """Returns smooth(coef, binv_t, b, x0, lmax) -> x for ONE sample
    (-> (x, b - A x) when emit_residual, at zero extra flops — see
    _fused_chebyshev_kernel).

    coef: (NC, N) stored dtype; binv_t: (bw, m, nt, S) stored dtype
    (column-major block inverse, see _emit_block_apply);
    b, x0: flat (N*m,) f32; lmax: scalar f32.  Batched calls lower to
    lax.map over samples (vmap of pallas_call fails through the axon
    tunnel; single-sample whole-array kernels compile)."""
    m = desc.n_mi
    nt, S = dims[0], int(np.prod(dims[1:]))
    assert nt * S == desc.grid_size

    def _unview(Y, ref):
        return Y.transpose(1, 2, 0).reshape(-1).astype(ref.dtype)

    @jax.custom_batching.custom_vmap
    def smooth(coef, binv_t, b, x0, lmax):
        ipt = interpret or jax.default_backend() == "cpu"
        coef3 = coef.reshape(-1, nt, S)
        B = b.reshape(nt, S, m).transpose(2, 0, 1).astype(jnp.float32)
        X0 = x0.reshape(nt, S, m).transpose(2, 0, 1).astype(jnp.float32)
        lmax11 = jnp.asarray(lmax, jnp.float32).reshape(1, 1)
        Y = _fused_single(desc, nt, S, steps, ratio, x0_zero, emit_residual,
                          factored, ipt, coef3, binv_t, B, X0, lmax11)
        if emit_residual:
            return _unview(Y[0], b), _unview(Y[1], b)
        return _unview(Y, b)

    @smooth.def_vmap
    def _smooth_vmap(axis_size, in_batched, *args):
        args_b = tuple(
            a if bat else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, bat in zip(args, in_batched)
        )
        out = jax.lax.map(lambda t: smooth(*t), args_b)
        return out, jax.tree.map(lambda _: True, out)

    return smooth

"""Pallas TPU kernels.

First kernel family: batched many-small-matrix Cholesky factorization and
triangular solves — the workhorse of the time-line block smoother
(solvers/multigrid.py), which factors thousands of (t x mi)-sized SPD blocks
per level.  XLA's batched Cholesky targets large matrices; for many small
blocks a Pallas kernel keeps each block resident in VMEM and unrolls the
factorization with vector ops.

All kernels pad the block size to a lane multiple and run one grid program
per chunk of blocks.  Interpret mode makes them testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chol_kernel(a_ref, l_ref, *, n: int, np_: int):
    """Cholesky of one (np_, np_) padded block; valid region is (n, n).

    Left-looking column algorithm with the trailing update applied one
    column at a time (vector ops of length np_)."""
    A = a_ref[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    L = jnp.where((eye == col_ids) & (eye >= n), 1.0, A)  # pad diag with 1

    def body(j, L):
        # current column j, updated by previously computed columns
        col = jax.lax.dynamic_slice(L, (0, j), (np_, 1))[:, 0]
        diag = jnp.maximum(col[j], 1e-30)
        d = jax.lax.rsqrt(diag)
        newcol = col * d
        # zero above the diagonal
        rows = jax.lax.broadcasted_iota(jnp.int32, (np_,), 0)
        newcol = jnp.where(rows < j, 0.0, newcol)
        L = jax.lax.dynamic_update_slice(L, newcol[:, None], (0, j))
        # rank-1 update of the trailing submatrix: A[:, k] -= newcol * newcol[k]
        mask = (col_ids > j)
        L = L - jnp.where(mask, jnp.outer(newcol, newcol), 0.0)
        return L

    L = jax.lax.fori_loop(0, n, body, L)
    # zero strictly-upper part
    l_ref[0] = jnp.where(col_ids <= eye, L, 0.0)


def block_cholesky(B: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched Cholesky of (N, n, n) SPD blocks (n <= 512) via Pallas.

    Returns lower factors with zero upper triangles; padded lanes carry 1 on
    the diagonal internally so rsqrt stays finite."""
    N, n, _ = B.shape
    np_ = max(_round_up(n, 128), 128)
    if n != np_:
        B = jnp.pad(B, ((0, 0), (0, np_ - n), (0, np_ - n)))
    kernel = functools.partial(_chol_kernel, n=n, np_=np_)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, np_, np_), B.dtype),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, np_, np_), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, np_, np_), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(B)
    return out[:, :n, :n]


def _cho_solve_kernel(l_ref, b_ref, x_ref, *, n: int, np_: int):
    """Solve L L^T x = b for one padded block (b: (np_, m))."""
    L = l_ref[0]
    b = b_ref[0]

    # forward substitution: y_j = (b_j - L[j, :j] @ y) / L[j, j]
    def fwd(j, y):
        Lrow = jax.lax.dynamic_slice(L, (j, 0), (1, np_))[0]
        yj = (jax.lax.dynamic_slice(b, (j, 0), (1, y.shape[1]))[0] - Lrow @ y) / jnp.maximum(L[j, j], 1e-30)
        return jax.lax.dynamic_update_slice(y, yj[None, :], (j, 0))

    y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(b))

    # back substitution on L^T: x_j = (y_j - L[:, j] @ x) / L[j, j]
    def bwd(i, x):
        j = n - 1 - i
        Lcol = jax.lax.dynamic_slice(L, (0, j), (np_, 1))[:, 0]
        xj = (jax.lax.dynamic_slice(y, (j, 0), (1, x.shape[1]))[0] - Lcol @ x) / jnp.maximum(L[j, j], 1e-30)
        return jax.lax.dynamic_update_slice(x, xj[None, :], (j, 0))

    x_ref[0] = jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(b))


def block_cho_solve(L: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched solve of L L^T x = b: L (N, n, n) lower factors, b (N, n)."""
    N, n, _ = L.shape
    np_ = max(_round_up(n, 128), 128)
    m = 128  # rhs lane width (single rhs broadcast into lanes)
    if n != np_:
        eye_pad = jnp.eye(np_, dtype=L.dtype)[None, n:, n:]
        L = jnp.pad(L, ((0, 0), (0, np_ - n), (0, np_ - n)))
        L = L.at[:, n:, n:].add(jnp.broadcast_to(eye_pad, (N, np_ - n, np_ - n)))
    bp = jnp.zeros((N, np_, m), b.dtype).at[:, :n, 0].set(b)
    kernel = functools.partial(_cho_solve_kernel, n=n, np_=np_)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, np_, m), b.dtype),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, np_, np_), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, np_, m), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, m), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(L, bp)
    return out[:, :n, 0]

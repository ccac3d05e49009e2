"""Explicit block-stencil assembly of the normal operator AtA.

Round-1 profiling showed the factored normal matvec (structured A then A^T,
ops/structured.py) runs ~48x off its bandwidth bound on TPU: the row-space
intermediates plus the concatenate/split boundaries defeat XLA fusion, so a
single AtA application costs ~50 unfused HBM round trips.  This module
removes the row space entirely: AtA is assembled ONCE per solve into an
axis-aligned block-stencil form and every subsequent application (the 40+
FGMRES/Chebyshev matvecs of a solve) is a short chain of flat shifted
multiply-adds over grid-shaped fields — no gathers, no concatenates, no
row-space intermediates.

Why AtA is an axis-aligned block stencil: every constraint row of A couples
variables along at most ONE coordinate axis —
  * equation rows touch all mi at a single point (offset 0);
  * initial rows touch a single variable;
  * central rows along axis c touch values at offsets -2..2 (interior) or
    0..4 / 0..-4 (one-sided edges) plus the derivative variable at 0;
  * Taylor rows along c touch offsets 0 and +-1.
Hence (AtA)[(p,i),(q,j)] is nonzero only for q = p + delta * e_c with
|delta| <= 4, and the only channel pairs (i, j) at delta != 0 are
(value, value), (value, deriv_c) and (deriv_c, value).  The representation is

  coef[ch, point] (channel-major) with channels =
      [ dense n_mi x n_mi offset-0 block (row-major) |
        per axis c, per delta in 1..4:
            vv   : (value@p,   value@p+d)
            vd_k : (value@p,   deriv_k@p+d)   k over central_mi_indices(c)
            dv_k : (deriv_k@p, value@p+d) ]

Band fields are stored on the FULL grid, zero where the coupling does not
exist (including every point whose axis-c index exceeds d-1-delta).  The
zeros make the application wrap-around-safe on the C-order-flattened grid:
y0 += g * shift(x0, +s) and y0 += shift(g * x0, +s) with the flat stride
s = delta * stride_c never pick up contributions across axis boundaries
because g vanishes there.  Symmetry of AtA is applied, not stored: each band
entry M[(p,i),(p+s,j)] acts in both directions.

Parity note: the reference never materializes AtA for the sparse path — it
computes torch.sparse.mm(A^T, A) into CSR once per solve
(reference solver/multigrid.py:210-240) and runs CuPy triangular solves on
it.  This module is the TPU-native analogue of that "assemble once, apply
many" decision, with the assembled form chosen for the VPU (dense stencil
fields) instead of for CSR.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops.constraints import (
    ConstraintSpec,
    _point_strides,
)
from mech_nn_discovery_pde_tpu.ops.structured import StructuredValues, _shift_slices

MAX_DELTA = 4  # largest axis offset in AtA (one-sided 5-point edge stencils)


class Band(NamedTuple):
    coord: int
    delta: int
    stride: int  # flat grid-point stride = delta * stride_c
    kind: str  # 'vv' | 'vd' | 'dv'
    mi_k: int  # deriv channel (unused for 'vv')
    ch: int  # channel index in coef


class NormalStencilDesc(NamedTuple):
    coord_dims: Tuple[int, ...]
    n_mi: int
    grid_size: int
    n_channels: int
    bands: Tuple[Band, ...]


def make_desc(spec: ConstraintSpec) -> NormalStencilDesc:
    if spec.evolution:
        raise NotImplementedError(
            "evolution=True equation rows reference the previous time step; "
            "the assembled block-stencil normal operator assumes same-point "
            "equation entries — use the factored structured path "
            "(ops/structured.py models the shift; MultigridSolver falls "
            "back to mg_normal_op='factored' automatically)"
        )
    vs = spec.var_set
    m = vs.n_mi
    strides = _point_strides(spec.coord_dims)
    ch = m * m
    bands: List[Band] = []
    for c in range(vs.n_coord):
        for delta in range(1, MAX_DELTA + 1):
            s = int(delta * strides[c])
            bands.append(Band(c, delta, s, "vv", 0, ch))
            ch += 1
            for mik in vs.central_mi_indices(c):
                bands.append(Band(c, delta, s, "vd", mik, ch))
                ch += 1
                bands.append(Band(c, delta, s, "dv", mik, ch))
                ch += 1
    return NormalStencilDesc(
        coord_dims=spec.coord_dims,
        n_mi=m,
        grid_size=vs.grid_size,
        n_channels=ch,
        bands=tuple(bands),
    )


def _band_channel(desc: NormalStencilDesc, coord, delta, kind, mi_k=0) -> int:
    for b in desc.bands:
        if (
            b.coord == coord
            and b.delta == delta
            and b.kind == kind
            and (kind == "vv" or b.mi_k == mi_k)
        ):
            return b.ch
    raise KeyError((coord, delta, kind, mi_k))


def build_normal_coef(
    spec: ConstraintSpec, desc: NormalStencilDesc, sv: StructuredValues
) -> jnp.ndarray:
    """Assemble AtA stencil fields from one sample's StructuredValues.

    Returns CHANNEL-MAJOR (n_channels, grid_size): each channel is one
    contiguous grid-shaped field, which is what both the XLA apply (flat
    shifted multiply-adds on rows) and the Pallas apply (whole sample in
    VMEM) want.  Assembly happens point-major (grid slices) and transposes
    once at the end.  Pure jittable JAX (static slices only); vmap over the
    leading axis for batches.  Runs once per solve per level — not a hot
    path."""
    vs = spec.var_set
    dims = spec.coord_dims
    nd = len(dims)
    m = vs.n_mi
    dtype = sv.eq.dtype
    C = jnp.zeros(dims + (desc.n_channels,), dtype)

    def dch(i: int, j: int) -> int:
        return i * m + j

    def ax_slice(c: int, lo: int, hi: int):
        idx = [slice(None)] * nd
        idx[c] = slice(lo, hi)
        return tuple(idx)

    # ---- equation rows: full mi outer product at interior points ----------
    # (assumes evolution=False: all entries at the row's own point, as does
    # ops/structured.py)
    interior = (slice(1, None),) + (slice(1, -1),) * (nd - 1)
    outer = sv.eq[..., :, None] * sv.eq[..., None, :]
    C = C.at[interior + (slice(0, m * m),)].add(
        outer.reshape(outer.shape[:-2] + (m * m,))
    )

    # ---- initial rows: squared weights on the diagonal --------------------
    off = 0
    for box in spec.iv_boxes:
        size = box.size * spec.n_iv
        v = sv.init[off : off + size].reshape(box.shape + (spec.n_iv,))
        contrib = jnp.sum(v * v, axis=-1)
        bsl = tuple(slice(int(b), int(e) + 1) for b, e in zip(box.begin, box.end))
        C = C.at[bsl + (dch(box.mi_index, box.mi_index),)].add(contrib)
        off += size

    # ---- central rows ------------------------------------------------------
    for c in range(nd):
        w = sv.central[c]  # dims + (n_cmi, 6)
        d = dims[c]
        cmi = vs.central_mi_indices(c)
        for rs, offs in _shift_slices(d):
            q_lo, q_hi = rs.start, rs.stop
            wreg = w[ax_slice(c, q_lo, q_hi)]
            # value-value pairs (sum over derivative orders k: separate rows,
            # same value variables)
            for j1 in range(5):
                for j2 in range(j1, 5):
                    o1, o2 = offs[j1], offs[j2]
                    prod = jnp.sum(wreg[..., :, j1] * wreg[..., :, j2], axis=-1)
                    if j1 == j2:
                        C = C.at[
                            ax_slice(c, q_lo + o1, q_hi + o1) + (dch(0, 0),)
                        ].add(prod)
                    else:
                        lo_o, hi_o = min(o1, o2), max(o1, o2)
                        chv = _band_channel(desc, c, hi_o - lo_o, "vv")
                        C = C.at[
                            ax_slice(c, q_lo + lo_o, q_hi + lo_o) + (chv,)
                        ].add(prod)
            # value-derivative and derivative-derivative pairs
            for k, mik in enumerate(cmi):
                w5 = wreg[..., k, 5]
                for j in range(5):
                    o = offs[j]
                    prod = wreg[..., k, j] * w5
                    if o == 0:
                        C = C.at[ax_slice(c, q_lo, q_hi) + (dch(0, mik),)].add(prod)
                        C = C.at[ax_slice(c, q_lo, q_hi) + (dch(mik, 0),)].add(prod)
                    elif o < 0:
                        chb = _band_channel(desc, c, -o, "vd", mik)
                        C = C.at[ax_slice(c, q_lo + o, q_hi + o) + (chb,)].add(prod)
                    else:
                        chb = _band_channel(desc, c, o, "dv", mik)
                        C = C.at[ax_slice(c, q_lo, q_hi) + (chb,)].add(prod)
                C = C.at[ax_slice(c, q_lo, q_hi) + (dch(mik, mik),)].add(w5 * w5)

    # ---- Taylor rows -------------------------------------------------------
    # entry channel of term index t in a Taylor row: value, first, (second)
    order = spec.order
    for c in range(nd):
        d = dims[c]
        cmi = vs.central_mi_indices(c)
        term_mi = [0] + list(cmi)  # mi channel per leading term
        n_lead = order + 1
        for v, forward in ((sv.fwd[c], True), (sv.bwd[c], False)):
            # row points: q_c in 0..d-2 (fwd) / 1..d-1 (bwd); neighbor is
            # q+1 (fwd) / q-1 (bwd).  `lo` slice = smaller-index point of the
            # (row, neighbor) pair — always extent d-1 along c.
            row_sl = ax_slice(c, 0, d - 1) if forward else ax_slice(c, 1, d)
            lo_sl = ax_slice(c, 0, d - 1)
            vlast = v[..., n_lead]
            # leading-term pairs at the row point (offset 0)
            for a in range(n_lead):
                for b in range(a, n_lead):
                    prod = v[..., a] * v[..., b]
                    ma, mb = term_mi[a], term_mi[b]
                    if a == b:
                        C = C.at[row_sl + (dch(ma, ma),)].add(prod)
                    else:
                        C = C.at[row_sl + (dch(ma, mb),)].add(prod)
                        C = C.at[row_sl + (dch(mb, ma),)].add(prod)
            # neighbor value squared (offset 0 at the neighbor point)
            nbr_sl = ax_slice(c, 1, d) if forward else ax_slice(c, 0, d - 1)
            C = C.at[nbr_sl + (dch(0, 0),)].add(vlast * vlast)
            # cross pairs (row terms x neighbor value), stored at the
            # smaller-index point of the pair:
            #   fwd: neighbor = q+1  -> (term@q,   value@q+1)
            #   bwd: neighbor = q-1  -> (value@q-1, term@q)
            vv_ch = _band_channel(desc, c, 1, "vv")
            C = C.at[lo_sl + (vv_ch,)].add(v[..., 0] * vlast)
            for k, mik in enumerate(cmi):
                prod = v[..., 1 + k] * vlast
                if forward:
                    chb = _band_channel(desc, c, 1, "dv", mik)  # (deriv@q, val@q+1)
                else:
                    chb = _band_channel(desc, c, 1, "vd", mik)  # (val@q-1, deriv@q)
                C = C.at[lo_sl + (chb,)].add(prod)

    return C.reshape(vs.grid_size, desc.n_channels).T


def _band_channels(b: Band) -> Tuple[int, int]:
    """(mi channel at p, mi channel at p+stride) of a band entry."""
    if b.kind == "vv":
        return 0, 0
    if b.kind == "vd":
        return 0, b.mi_k
    return b.mi_k, 0  # 'dv'


def _band_groups(desc: NormalStencilDesc):
    """Bands grouped by (coord, delta) — consecutive channels by
    construction, one contiguous coefficient slab per group."""
    from itertools import groupby

    out = []
    for _, grp in groupby(desc.bands, key=lambda b: (b.coord, b.delta)):
        out.append(tuple(grp))
    return tuple(out)


def _rolled_apply_static(desc: NormalStencilDesc):
    """Static data for the rolled mega-batch apply: row-take indices and
    0/1 selection matrices (built once per process per spec)."""
    groups = _band_groups(desc)
    m = desc.n_mi
    cis_all = [_band_channels(b)[0] for g in groups for b in g]
    cjs_all = [_band_channels(b)[1] for g in groups for b in g]
    nb = len(cis_all)
    # forward rows read x at channel cj (rolled -s), accumulate into ci;
    # backward rows read x at channel ci (product rolled +s), accumulate
    # into cj
    sel = np.zeros((m, 2 * nb), np.float32)
    for r, ci in enumerate(cis_all):
        sel[ci, r] = 1.0
    for r, cj in enumerate(cjs_all):
        sel[cj, nb + r] = 1.0
    # row-read as a 0/1 matmul (single 1 per row -> exact copy; gathers on
    # the sublane axis are slow on TPU, MXU matmuls are not)
    take = np.zeros((2 * nb, m), np.float32)
    for r, c in enumerate(cjs_all + cis_all):
        take[r, c] = 1.0
    # cache plain numpy only: jnp arrays created inside a trace are tracers
    # and must not outlive it
    return groups, nb, take, sel


_ROLLED_CACHE: dict = {}


def normal_stencil_matvec(
    desc: NormalStencilDesc, coef: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """(AtA) @ x from the assembled stencil: (NC, grid), (num_vars,) ->
    (num_vars,).  Round-3 "rolled mega-batch" form — the apply is
    per-op-overhead bound on TPU (~5-20 us/op; VALIDATION.md), so the band
    pass is restructured into a handful of big ops:

      1. one static row-take builds the (2*nb, N) x-row stack (forward rows
         at channel cj, backward rows at channel ci);
      2. per (axis, delta) group, ONE circular roll aligns the forward rows
         (x rolled by -s) — wraparound is harmless because the coefficient
         slab is structurally zero wherever p+s crosses an axis boundary
         (the same zeros that make the padded form safe);
      3. one elementwise product against [G; G];
      4. per group, ONE roll of the backward products by +s (zero coef tail
         lands on the wrapped entries);
      5. one (m, 2*nb) 0/1 selection matmul accumulates all rows into the
         m output channels (MXU), fused with the offset-0 block einsum.

    ~45 ops total vs ~150 for the stride-grouped padded form it replaces
    (kept as normal_stencil_matvec_padded, the exactness reference)."""
    N, m = desc.grid_size, desc.n_mi
    if desc not in _ROLLED_CACHE:
        _ROLLED_CACHE[desc] = _rolled_apply_static(desc)
    groups, nb, take, sel = _ROLLED_CACHE[desc]
    X = x.reshape(N, m).T  # (m, N) channel-major

    D = coef[: m * m].reshape(m, m, N)
    Y = jnp.einsum("ijn,jn->in", D, X, precision=jax.lax.Precision.HIGHEST)

    G = coef[m * m : m * m + nb]
    Xrows = jnp.einsum("km,mn->kn", take.astype(X.dtype), X,
                       precision=jax.lax.Precision.HIGHEST)  # exact row copies
    # forward halves: roll x rows by -s per group
    fparts = []
    off = 0
    for g in groups:
        s, k = g[0].stride, len(g)
        fparts.append(jnp.roll(Xrows[off : off + k], -s, axis=1))
        off += k
    fstack = jnp.concatenate(fparts, axis=0)
    prod = jnp.concatenate([G, G], axis=0) * jnp.concatenate(
        [fstack, Xrows[nb:]], axis=0
    )
    # backward halves: roll the products by +s per group
    bparts = []
    off = nb
    for g in groups:
        s, k = g[0].stride, len(g)
        bparts.append(jnp.roll(prod[off : off + k], s, axis=1))
        off += k
    allrows = jnp.concatenate([prod[:nb]] + bparts, axis=0)
    Y = Y + jnp.einsum("ik,kn->in", sel.astype(allrows.dtype), allrows,
                       precision=jax.lax.Precision.HIGHEST)
    return Y.T.reshape(-1)


def normal_stencil_matvec_padded(
    desc: NormalStencilDesc, coef: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """Stride-grouped padded-slab apply (round-2 form; exactness reference
    for the rolled mega-batch production apply)."""
    N, m = desc.grid_size, desc.n_mi
    X = x.reshape(N, m).T  # (m, N) channel-major

    D = coef[: m * m].reshape(m, m, N)
    Y = jnp.einsum("ijn,jn->in", D, X, precision=jax.lax.Precision.HIGHEST)
    ys = [Y[i] for i in range(m)]

    for grp in _band_groups(desc):
        s = grp[0].stride
        ch0 = grp[0].ch
        k = len(grp)
        G = coef[ch0 : ch0 + k, : N - s]  # one contiguous slab
        cis = [_band_channels(b)[0] for b in grp]
        cjs = [_band_channels(b)[1] for b in grp]
        # forward: y_ci[p] += g[p] * x_cj[p + s]
        Pf = G * jnp.stack([X[cj, s:] for cj in cjs])
        # backward: y_cj[p + s] += g[p] * x_ci[p]
        Pb = G * jnp.stack([X[ci, : N - s] for ci in cis])
        for ch in sorted(set(cis)):
            rows = [r for r, c in enumerate(cis) if c == ch]
            acc = Pf[rows[0]]
            for r in rows[1:]:
                acc = acc + Pf[r]
            ys[ch] = ys[ch] + jnp.pad(acc, (0, s))
        for ch in sorted(set(cjs)):
            rows = [r for r, c in enumerate(cjs) if c == ch]
            acc = Pb[rows[0]]
            for r in rows[1:]:
                acc = acc + Pb[r]
            ys[ch] = ys[ch] + jnp.pad(acc, (s, 0))

    return jnp.stack(ys, axis=1).reshape(-1)


def _stencil_kernel_body(desc: NormalStencilDesc, coef_ref, x_ref, y_ref):
    """Shared Pallas kernel body on (NC, N)/(m, N)/(m, N) VMEM refs."""
    m, N = desc.n_mi, desc.grid_size
    # dense offset-0 block
    for i in range(m):
        acc = coef_ref[i * m, :] * x_ref[0, :]
        for j in range(1, m):
            acc = acc + coef_ref[i * m + j, :] * x_ref[j, :]
        y_ref[i, :] = acc
    # axis bands: symmetric application of each stored entry
    for b in desc.bands:
        s = b.stride
        ci, cj = _band_channels(b)
        g = coef_ref[b.ch, 0 : N - s]
        y_ref[ci, 0 : N - s] = y_ref[ci, 0 : N - s] + g * x_ref[cj, s:N]
        y_ref[cj, s:N] = y_ref[cj, s:N] + g * x_ref[ci, 0 : N - s]


def _pallas_single(
    desc: NormalStencilDesc, coef: jnp.ndarray, X: jnp.ndarray, interpret: bool
) -> jnp.ndarray:
    """Single whole-array-in-VMEM pallas_call of the stencil apply:
    coef (NC, N), X (m, N) -> (m, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, N = desc.n_mi, desc.grid_size

    def kernel(coef_ref, x_ref, y_ref):
        _stencil_kernel_body(desc, coef_ref, x_ref, y_ref)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, N), X.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coef, X)


def normal_stencil_matvec_pallas(
    desc: NormalStencilDesc,
    coef: jnp.ndarray,
    x: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas TPU apply: the whole sample (stencil fields + solution vector)
    resides in VMEM and every shifted multiply-add happens on-chip, so HBM
    traffic is exactly read-coef + read-x + write-y once.  The XLA apply
    (normal_stencil_matvec) is the ground truth; measured bit-exact against
    it on real TPU for 2D and 3D GL shapes.

    Sizes: needs (NC + 2m) * grid * 4 bytes of VMEM — 3.8 MB for the GL
    fine level (8, 32, 32), comfortably under the ~16 MB/core budget.  For
    larger grids fall back to the XLA apply.

    vmap-safe: batching runs lax.map over single-sample kernels — Mosaic
    (through the axon remote compiler) rejects vmap-of-pallas_call and
    grid-batched forms of this body.  A K-fold variant that concatenated K
    non-interacting samples along the flat grid axis (exact, by the same
    zero-padding argument that makes the apply wraparound-safe) was tried
    and measured SLOWER (5.08 ms/apply at K=2 vs 2.79 single-sample on the
    GL batch); the stride-grouped XLA apply measured 1.22 ms/apply in the
    same session and is the production default.  (A grid-batched
    pallas_call variant lives in benchmarks/pallas_grid_batched.py — it
    compile-hangs through the axon remote Mosaic path today.)

    On CPU backends (tests) the kernel runs in interpret mode
    automatically: Mosaic lowering is TPU-only."""
    from jax import custom_batching

    interpret = interpret or jax.default_backend() == "cpu"
    m, N = desc.n_mi, desc.grid_size

    @custom_batching.custom_vmap
    def _apply(coef, X):
        return _pallas_single(desc, coef, X, interpret)

    @_apply.def_vmap
    def _apply_vmap(axis_size, in_batched, coef, X):
        coef_b, x_b = in_batched
        if not coef_b:
            coef = jnp.broadcast_to(coef, (axis_size,) + coef.shape)
        if not x_b:
            X = jnp.broadcast_to(X, (axis_size,) + X.shape)
        return jax.lax.map(lambda cx: _apply(cx[0], cx[1]), (coef, X)), True

    X = x.reshape(N, m).T
    y = _apply(coef, X)
    return y.T.reshape(-1)


def make_normal_stencil_ops(spec: ConstraintSpec):
    """(desc, build, apply) convenience bundle for one system."""
    desc = make_desc(spec)

    def build(sv: StructuredValues) -> jnp.ndarray:
        return build_normal_coef(spec, desc, sv)

    def apply_(coef: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return normal_stencil_matvec(desc, coef, x)

    return desc, build, apply_

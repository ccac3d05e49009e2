"""PDESystem: static structure + jitted linear-algebra surface.

This is the TPU-native replacement for the reference's PDESYSLP
(solver/lp_pde_central_diff.py:350-2244).  The structure (index arrays, pair
tables) is NumPy, built once at layer construction and closed over as
constants by jitted fill/solve functions.  All runtime methods are pure
differentiable JAX on *per-sample* value vectors; batching is done with vmap
by the callers — there is no block-diagonal flattening (reference
:1171-1192), the batch stays an explicit array axis.

Value-vector layout (per sample): [equation | initial | derivative] entries,
each block in the construction order of ops/constraints.py.  RHS layout:
[equation rows (cropped grid) | iv rows | derivative rows (zeros)].
"""

from __future__ import annotations

from functools import cached_property
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops import native, stencil
from mech_nn_discovery_pde_tpu.ops.constraints import (
    ConstraintSpec,
    build_constraint_spec,
)


def _pair_tables(rows: np.ndarray, cols: np.ndarray):
    """For AtA assembly: all ordered entry pairs (a, b) sharing a row.
    Returns (pair_a, pair_b) int32 entry-index arrays.  Vectorized by grouping
    rows by their entry count (only a handful of distinct counts exist)."""
    order = np.argsort(rows, kind="stable")  # rows already sorted, but be safe
    counts = np.bincount(rows)
    # offsets of each row's first entry in `order`
    offsets = np.concatenate([[0], np.cumsum(counts)])
    pa_parts, pb_parts = [], []
    for k in np.unique(counts):
        if k == 0:
            continue
        rws = np.nonzero(counts == k)[0]
        # (n_rows_k, k) entry indices for these rows
        ent = order[offsets[rws][:, None] + np.arange(k)[None, :]]
        ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
        pa_parts.append(ent[:, ii.ravel()].ravel())
        pb_parts.append(ent[:, jj.ravel()].ravel())
    pa = np.concatenate(pa_parts).astype(np.int32)
    pb = np.concatenate(pb_parts).astype(np.int32)
    return pa, pb


class PDESystem:
    """Constraint system with jittable fills and linear operators."""

    def __init__(self, spec: ConstraintSpec):
        self.spec = spec
        self.var_set = spec.var_set
        self.coord_dims = spec.coord_dims
        self.num_vars = spec.num_vars
        self.n_rows = spec.n_rows
        self.n_eq_rows = spec.n_eq_rows
        self.n_init_rows = spec.n_init_rows
        self.n_deriv_rows = spec.n_deriv_rows

        self.rows_all = spec.rows_all  # sorted (block construction order)
        self.cols_all = spec.cols_all
        self.n_entries = int(self.cols_all.shape[0])
        self.n_eq_entries = int(spec.eq_cols.shape[0])
        self.n_init_entries = int(spec.init_cols.shape[0])
        self.n_deriv_entries = int(spec.deriv_cols.shape[0])

        # static permutation for column-sorted segment sums (rmatvec)
        self.col_perm = np.argsort(self.cols_all, kind="stable").astype(np.int32)
        self.cols_sorted = self.cols_all[self.col_perm]

        self._init_values = spec.init_values_static.copy()

    @classmethod
    def build(
        cls,
        coord_dims: Sequence[int],
        order: int = 2,
        init_index_mi_list=None,
        n_iv: int = 1,
        step_size: float = 0.25,
        evolution: bool = False,
    ) -> "PDESystem":
        return cls(
            build_constraint_spec(
                coord_dims, order, init_index_mi_list, n_iv, step_size, evolution
            )
        )

    # ------------------------------------------------------------------
    # runtime fills (per batch: leading bs axis)
    # ------------------------------------------------------------------

    def equation_values(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return stencil.equation_values(self.spec, coeffs)

    def derivative_values(self, steps_list) -> jnp.ndarray:
        return stencil.derivative_values(self.spec, steps_list)

    def fill_values(
        self,
        coeffs: jnp.ndarray,
        steps_list,
        dtype=None,
    ) -> jnp.ndarray:
        """(bs, n_entries) full value vector (reference
        fill_constraints_torch :1766-1781, value part)."""
        eq = self.equation_values(coeffs)
        dv = self.derivative_values(steps_list)
        dtype = dtype or eq.dtype
        iv = jnp.broadcast_to(
            jnp.asarray(self._init_values, dtype=dtype), (eq.shape[0], self.n_init_entries)
        )
        return jnp.concatenate([eq.astype(dtype), iv, dv.astype(dtype)], axis=1)

    def fill_rhs(
        self, rhs: jnp.ndarray, iv_rhs: Optional[jnp.ndarray], dtype=None
    ) -> jnp.ndarray:
        """(bs, n_rows) stacked rhs [equation | initial | derivative(0)]."""
        eq_rhs = stencil.crop_rhs(self.spec, rhs)
        bs = eq_rhs.shape[0]
        dtype = dtype or eq_rhs.dtype
        if iv_rhs is None:
            iv_rhs = jnp.zeros((bs, 0), dtype=dtype)
        iv_rhs = iv_rhs.reshape(bs, -1).astype(dtype)
        if self.spec.n_iv > 1 and iv_rhs.shape[1] * self.spec.n_iv == self.n_init_rows:
            iv_rhs = jnp.repeat(iv_rhs, self.spec.n_iv, axis=1)
        elif iv_rhs.shape[1] != self.n_init_rows:
            raise ValueError(
                f"iv_rhs has {iv_rhs.shape[1]} entries per sample; expected "
                f"{self.n_init_rows} (one per initial-constraint row)"
                + (
                    f" or {self.n_init_rows // self.spec.n_iv} (repeated "
                    f"across n_iv={self.spec.n_iv} rows)"
                    if self.spec.n_iv > 1 and self.n_init_rows % self.spec.n_iv == 0
                    else ""
                )
            )
        dz = jnp.zeros((bs, self.n_deriv_rows), dtype=dtype)
        return jnp.concatenate([eq_rhs.astype(dtype), iv_rhs, dz], axis=1)

    # ------------------------------------------------------------------
    # linear operators (single sample; vmap for batches)
    # ------------------------------------------------------------------

    # ---- ELL-packed layouts: both matvec directions as pure gathers -----
    #
    # Every row has <= n_mi+1 entries and every column is touched by a
    # bounded number of rows, so A packs into dense (n, k) index/slot tables
    # padded with an out-of-range-free sentinel.  Matvecs become k gathers +
    # fused multiply-adds — no scatters/segment sums, which TPU handles far
    # worse.  The runtime value vector (construction order) is placed into
    # the ELL slots by a single precomputed sorted scatter.

    @cached_property
    def _ell(self):
        """Row-major ELL: (slot_target, cols_ell, k) for the CSR direction
        and (slot_target_T, rows_ell, kc) for the CSC direction."""

        def pack(group_idx, other_idx, n_groups):
            order = np.argsort(group_idx, kind="stable")
            g = group_idx[order]
            counts = np.bincount(g, minlength=n_groups)
            k = int(counts.max()) if counts.size else 1
            offsets = np.concatenate([[0], np.cumsum(counts)])
            slot = np.arange(g.shape[0]) - offsets[g]
            # target position of entry `order[i]` in the (n_groups, k) table
            target = g.astype(np.int64) * k + slot
            idx_tab = np.zeros((n_groups, k), dtype=np.int32)
            idx_tab.reshape(-1)[target] = other_idx[order]
            # entry -> flat slot (in original entry order)
            entry_target = np.empty(g.shape[0], dtype=np.int64)
            entry_target[order] = target
            return entry_target, idx_tab, k

        tgt_r, cols_ell, k = pack(self.rows_all, self.cols_all, self.n_rows)
        tgt_c, rows_ell, kc = pack(self.cols_all, self.rows_all, self.num_vars)
        return {
            "tgt_r": tgt_r, "cols_ell": cols_ell, "k": k,
            "tgt_c": tgt_c, "rows_ell": rows_ell, "kc": kc,
        }

    def _ell_values(self, values: jnp.ndarray, transpose: bool) -> jnp.ndarray:
        e = self._ell
        if transpose:
            tgt, n, k = e["tgt_c"], self.num_vars, e["kc"]
        else:
            tgt, n, k = e["tgt_r"], self.n_rows, e["k"]
        flat = jnp.zeros((n * k,), values.dtype)
        return flat.at[jnp.asarray(tgt)].set(values).reshape(n, k)

    def matvec(self, values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x : (n_entries,), (num_vars,) -> (n_rows,)."""
        e = self._ell
        v = self._ell_values(values, transpose=False)
        return jnp.sum(v * x[jnp.asarray(e["cols_ell"])], axis=1)

    def rmatvec(self, values: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """A.T @ y : (n_entries,), (n_rows,) -> (num_vars,)."""
        e = self._ell
        v = self._ell_values(values, transpose=True)
        return jnp.sum(v * y[jnp.asarray(e["rows_ell"])], axis=1)

    # ---- packed operator: amortize ELL packing across repeated matvecs ----

    def pack_values(self, values: jnp.ndarray):
        """Pack a value vector into both ELL tables once; use with
        matvec_packed/rmatvec_packed/normal_matvec_packed inside iterative
        loops (packing inside a while_loop body would repeat per iteration)."""
        return {
            "r": self._ell_values(values, transpose=False),
            "c": self._ell_values(values, transpose=True),
        }

    def matvec_packed(self, packed, x: jnp.ndarray) -> jnp.ndarray:
        e = self._ell
        return jnp.sum(packed["r"] * x[jnp.asarray(e["cols_ell"])], axis=1)

    def rmatvec_packed(self, packed, y: jnp.ndarray) -> jnp.ndarray:
        e = self._ell
        return jnp.sum(packed["c"] * y[jnp.asarray(e["rows_ell"])], axis=1)

    def normal_matvec_packed(self, packed, x: jnp.ndarray) -> jnp.ndarray:
        return self.rmatvec_packed(packed, self.matvec_packed(packed, x))

    # ---- structured (gather-free) convenience wrappers ------------------

    def structured_ops(self, dtype):
        """(matvec, rmatvec) closures over StructuredValues (cached per
        dtype).  The gather-free implementation — use for all hot paths."""
        from mech_nn_discovery_pde_tpu.ops.structured import make_structured_ops

        key = jnp.dtype(dtype).name
        if not hasattr(self, "_sops_cache"):
            self._sops_cache = {}
        if key not in self._sops_cache:
            self._sops_cache[key] = make_structured_ops(self.spec, jnp.dtype(dtype))
        return self._sops_cache[key]

    def split_values(self, values: jnp.ndarray):
        from mech_nn_discovery_pde_tpu.ops.structured import split_values

        return split_values(self.spec, values)

    @property
    def _use_structured(self) -> bool:
        # 1D (ODE-sized) systems use the segment-sum path: the structured
        # slice graph buys nothing at these sizes, and the Kamani training
        # step intermittently faulted the TPU worker in this session
        # (subsequent bisection could not pin the fault to any one
        # implementation — the worker was also crashing on other code paths,
        # so this is a conservative choice, not established causality).
        # Evolution equation rows (previous-time-step entries) are modeled
        # by an extra static shifted slice in matvec_structured.
        return len(self.coord_dims) > 1

    def matvec_s(self, values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        if not self._use_structured:
            return self.matvec_coo(values, x)
        mv, _ = self.structured_ops(x.dtype)
        return mv(self.split_values(values), x)

    def rmatvec_s(self, values: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if not self._use_structured:
            return self.rmatvec_coo(values, y)
        _, rmv = self.structured_ops(y.dtype)
        return rmv(self.split_values(values), y)

    def normal_matvec_s(self, values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        if not self._use_structured:
            return self.rmatvec_coo(values, self.matvec_coo(values, x))
        mv, rmv = self.structured_ops(x.dtype)
        sv = self.split_values(values)
        return rmv(sv, mv(sv, x))

    def matvec_coo(self, values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """Segment-sum reference implementation (used by tests)."""
        prod = values * x[self.cols_all]
        return jax.ops.segment_sum(
            prod, self.rows_all, num_segments=self.n_rows, indices_are_sorted=True
        )

    def rmatvec_coo(self, values: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        prod = (values * y[self.rows_all])[self.col_perm]
        return jax.ops.segment_sum(
            prod, self.cols_sorted, num_segments=self.num_vars, indices_are_sorted=True
        )

    def normal_matvec(self, values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """(A.T A) @ x, matrix-free."""
        return self.rmatvec(values, self.matvec(values, x))

    def normal_diag(self, values: jnp.ndarray) -> jnp.ndarray:
        """diag(A.T A) = segment-sum of squared entry values per column."""
        prod = (values * values)[self.col_perm]
        return jax.ops.segment_sum(
            prod, self.cols_sorted, num_segments=self.num_vars, indices_are_sorted=True
        )

    def normal_bound_vec(self, values: jnp.ndarray) -> jnp.ndarray:
        """(|A|.T |A|) @ 1 — row-wise absolute sums of AtA upper bound, used
        for Chebyshev/Jacobi eigenvalue bounds."""
        a = jnp.abs(values)
        return self.rmatvec(a, self.matvec(a, jnp.ones((self.num_vars,), values.dtype)))

    # ---- dense normal-equation assembly (small grids / MG coarsest) ----

    @cached_property
    def _raw_pairs(self):
        return _pair_tables(self.rows_all, self.cols_all)

    @cached_property
    def _pairs(self):
        native_result = native.build_pairs_sorted(
            self.rows_all, self.cols_all, self.num_vars
        )
        if native_result is not None:
            return native_result
        pa, pb = self._raw_pairs
        lin = self.cols_all[pa].astype(np.int64) * self.num_vars + self.cols_all[pb]
        # sort by linear target index for a sorted segment-sum scatter
        perm = np.argsort(lin, kind="stable")
        return pa[perm], pb[perm], lin[perm]

    def assemble_dense_A(self, values: jnp.ndarray) -> jnp.ndarray:
        """Dense A (n_rows, num_vars) via a single nnz-sized scatter.  On TPU,
        forming AtA as (dense A)^T (dense A) with one MXU matmul beats the
        pair-product scatter by ~10x in f32 (scatter serializes duplicate
        indices); use for f32 factorization targets."""
        lin = self.rows_all.astype(np.int64) * self.num_vars + self.cols_all
        flat = jnp.zeros((self.n_rows * self.num_vars,), values.dtype)
        flat = flat.at[jnp.asarray(lin)].add(values)
        return flat.reshape(self.n_rows, self.num_vars)

    def assemble_normal(self, values: jnp.ndarray) -> jnp.ndarray:
        """Dense AtA (num_vars, num_vars) via pair-product scatter.  Avoids
        the reference's dense A materialization + O(rows * n^2) bmm
        (qp_dual_dense_normal_kkt.py:30-33): cost is O(nnz * stencil) instead.
        """
        pa, pb, lin = self._pairs
        prod = values[pa] * values[pb]
        flat = jax.ops.segment_sum(
            prod, jnp.asarray(lin), num_segments=self.num_vars * self.num_vars,
            indices_are_sorted=True,
        )
        return flat.reshape(self.num_vars, self.num_vars)

    @cached_property
    def _point_block_pairs(self):
        """Entry pairs sharing a row AND a grid point — the (n_mi x n_mi)
        point-diagonal blocks of AtA, used by the point-block-Jacobi smoother."""
        pa, pb = self._raw_pairs
        n_mi = self.var_set.n_mi
        ca, cb = self.cols_all[pa], self.cols_all[pb]
        same = (ca // n_mi) == (cb // n_mi)
        pa, pb, ca, cb = pa[same], pb[same], ca[same], cb[same]
        lin = (ca // n_mi).astype(np.int64) * n_mi * n_mi + (ca % n_mi) * n_mi + (
            cb % n_mi
        )
        perm = np.argsort(lin, kind="stable")
        return pa[perm], pb[perm], lin[perm]

    def assemble_point_blocks(self, values: jnp.ndarray) -> jnp.ndarray:
        """(grid, n_mi, n_mi) point-diagonal blocks of AtA."""
        pa, pb, lin = self._point_block_pairs
        n_mi = self.var_set.n_mi
        grid = self.var_set.grid_size
        prod = values[pa] * values[pb]
        flat = jax.ops.segment_sum(
            prod, jnp.asarray(lin), num_segments=grid * n_mi * n_mi,
            indices_are_sorted=True,
        )
        return flat.reshape(grid, n_mi, n_mi)

    def _line_block_pairs(self, axis: int):
        """Entry pairs sharing a row AND a grid line along `axis` — the
        (d_axis*n_mi)^2 line-diagonal blocks of AtA.  Block id = flat index of
        the grid point with `axis` removed; within-block index =
        (position along axis, mi)."""
        pa, pb = self._raw_pairs
        n_mi = self.var_set.n_mi
        dims = self.var_set.coord_dims
        gi = self.var_set.grid_indices()  # (grid, n_coord)
        ca, cb = self.cols_all[pa], self.cols_all[pb]
        pta, ptb = ca // n_mi, cb // n_mi
        other = [c for c in range(len(dims)) if c != axis]
        # flat index over the non-axis dims
        if other:
            line_a = np.ravel_multi_index(
                tuple(gi[pta, c] for c in other), tuple(dims[c] for c in other)
            )
            line_b = np.ravel_multi_index(
                tuple(gi[ptb, c] for c in other), tuple(dims[c] for c in other)
            )
        else:
            line_a = np.zeros(pta.shape, dtype=np.int64)
            line_b = line_a
        same = line_a == line_b
        pa, pb = pa[same], pb[same]
        blk = line_a[same].astype(np.int64)
        wa = gi[ca[same] // n_mi, axis] * n_mi + ca[same] % n_mi
        wb = gi[cb[same] // n_mi, axis] * n_mi + cb[same] % n_mi
        bw = dims[axis] * n_mi
        lin = blk * bw * bw + wa * bw + wb
        perm = np.argsort(lin, kind="stable")
        n_blocks = int(np.prod([dims[c] for c in other])) if other else 1
        return pa[perm], pb[perm], lin[perm], n_blocks, bw

    @cached_property
    def _line_pairs_axis0(self):
        return self._line_block_pairs(0)

    def assemble_line_blocks(self, values: jnp.ndarray, axis: int = 0):
        """(n_lines, bw, bw) line-diagonal blocks of AtA along `axis`
        (bw = dims[axis] * n_mi)."""
        assert axis == 0, "only time-line blocks are precomputed"
        pa, pb, lin, n_blocks, bw = self._line_pairs_axis0
        prod = values[pa] * values[pb]
        flat = jax.ops.segment_sum(
            prod, jnp.asarray(lin), num_segments=n_blocks * bw * bw,
            indices_are_sorted=True,
        )
        return flat.reshape(n_blocks, bw, bw)

    def line_vec_to_blocks(self, r: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """(num_vars,) -> (n_lines, bw): gather each line's variables."""
        dims = self.var_set.coord_dims
        n_mi = self.var_set.n_mi
        x = r.reshape(dims + (n_mi,))
        # move `axis` in front of the mi axis, flatten the rest as lines
        x = jnp.moveaxis(x, axis, -2)  # (..., d_axis, n_mi)
        return x.reshape(-1, dims[axis] * n_mi)

    def line_blocks_to_vec(self, z: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        dims = self.var_set.coord_dims
        n_mi = self.var_set.n_mi
        other = tuple(dims[c] for c in range(len(dims)) if c != axis)
        x = z.reshape(other + (dims[axis], n_mi))
        x = jnp.moveaxis(x, -2, axis)
        return x.reshape(-1)

    # ------------------------------------------------------------------
    # solution reshaping / padding
    # ------------------------------------------------------------------

    def solution_reshaped(self, x: jnp.ndarray) -> jnp.ndarray:
        """(bs, num_vars) -> (bs, grid, n_mi) (reference :486-494)."""
        return x.reshape(-1, self.var_set.grid_size, self.var_set.n_mi)

    def pad_eq_rows(self, vals: jnp.ndarray) -> jnp.ndarray:
        return stencil.pad_rhs(self.spec, vals)

    def describe(self) -> str:
        return self.spec.describe()

"""Geometric multigrid preconditioner + FGMRES normal-equation solver.

TPU-native redesign of the reference sparse path (solver/multigrid.py,
solver/qp_dual_sparse_multigrid_normal_kkt.py):

- Coarse operators by *re-discretization*: field data (coeffs, rhs, iv,
  steps) is downsampled (align-corners linear) to halved grids and the
  constraint values are re-filled on each level's static structure
  (reference fill_coarse_grids, multigrid.py:115-163).  Not Galerkin RAP.
- The batch stays an explicit vmapped axis — no block-diagonal flattening.
- Smoothers: the reference's sequential Gauss-Seidel (CuPy CSR triangular
  solves, multigrid.py:399-405) has no TPU analogue; we use Chebyshev
  polynomial smoothing (default) or weighted Jacobi (reference alternate,
  :407-416), both matrix-free through A.
- Restriction/prolongation: per-channel align-corners resize as separable
  matrix contractions (reference F.interpolate, :340-391).
- Coarsest level: dense assembled AtA + batched Cholesky (reference
  :438-450), with the same precision policies as the dense path.
- The entire preconditioner runs in float32: the
  outer *flexible* GMRES iterates in the solve dtype and tolerates a
  variable/low-precision preconditioner by construction.  On TPU (f64
  emulated in software) this is the difference between usable and not.

Hierarchy data is treated as non-differentiated (the preconditioner affects
convergence only); gradients flow through the fine-level values/rhs via the
IFT custom VJP in ops/normal_solve.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig, default_config
from mech_nn_discovery_pde_tpu.ops.interp import interp_matrix, apply_separable
from mech_nn_discovery_pde_tpu.ops.normal_stencil import make_normal_stencil_ops
from mech_nn_discovery_pde_tpu.ops.structured import make_structured_ops, split_values
from mech_nn_discovery_pde_tpu.ops.system import PDESystem
from mech_nn_discovery_pde_tpu.solvers import krylov


def _cho_solve_b(L, b):
    return jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]


class MultigridSolver:
    """Grid hierarchy + V-cycle preconditioner for the PDE normal equations.

    Constructor signature mirrors reference MultigridSolver
    (multigrid.py:46-112)."""

    def __init__(
        self,
        bs: int,
        order: int,
        n_ind_dim: int,
        n_iv: int,
        init_index_mi_list,
        coord_dims: Sequence[int],
        n_iv_steps: int = 1,
        solver_dbl: bool = True,
        evolution: bool = False,
        downsample_first: bool = True,
        gamma: float = 0.5,
        alpha: float = 0.1,
        double_ret: bool = False,
        n_grid: int = 2,
        config: Optional[PDEConfig] = None,
        device=None,
        mesh=None,
        sp_axis: str = "sp",
    ):
        del n_iv_steps, gamma, alpha, double_ret, device
        self.evolution = evolution
        self.bs = bs
        self.n_ind_dim = n_ind_dim
        self.order = order
        self.n_iv = n_iv
        self.n_grid = n_grid
        self.downsample_first = downsample_first
        self.init_index_mi_list = init_index_mi_list or []
        self.config = config or default_config
        self.solver_dbl = solver_dbl
        x64 = jax.config.jax_enable_x64
        self.dtype = jnp.float64 if (solver_dbl and x64) else jnp.float32
        self.pdtype = jnp.float32  # preconditioner ASSEMBLY dtype
        mpd = self.config.mg_precond_dtype
        if mpd not in ("f32", "bf16", "bf16_factored"):
            raise ValueError(
                f"unknown mg_precond_dtype {mpd!r}; expected 'f32', 'bf16' "
                "or 'bf16_factored'"
            )
        # Storage dtypes (see config.mg_precond_dtype).  Assembly, block
        # factorization, vectors and the lmax power iteration stay f32.
        # 'bf16_factored': binv holds the PSD square-root factor W = L^-T
        # (B^-1 = W W^T) in bf16 — round(W) round(W)^T stays PSD, unlike the
        # entrywise-rounded inverse, which goes indefinite at cond ~2e6 and
        # collapses the smoother (benchmarks/bf16_mixed_diag.py) — while
        # coef/coarse_inv stay f32 (coef bf16 alone costs 25x quality).
        self.vdtype = jnp.bfloat16 if mpd == "bf16" else jnp.float32
        self._factored_binv = mpd == "bf16_factored"
        self.binv_dtype = (
            jnp.bfloat16 if mpd in ("bf16", "bf16_factored") else jnp.float32
        )
        if self.config.mg_normal_op not in ("stencil", "stencil_pallas", "factored"):
            raise ValueError(
                f"unknown mg_normal_op {self.config.mg_normal_op!r}; expected "
                "'stencil', 'stencil_pallas' or 'factored'"
            )
        if self.config.mg_smoother not in ("chebyshev", "chebyshev_fused",
                                           "jacobi"):
            raise ValueError(
                f"unknown mg_smoother {self.config.mg_smoother!r}; expected "
                "'chebyshev', 'chebyshev_fused' or 'jacobi'"
            )
        self._fused_smoother = self.config.mg_smoother == "chebyshev_fused"
        if self._fused_smoother:
            if evolution or self.config.mg_normal_op == "factored":
                raise ValueError(
                    "mg_smoother='chebyshev_fused' needs the assembled "
                    "stencil operator (mg_normal_op='stencil'); evolution "
                    "systems fall back to 'factored' and are unsupported"
                )
            if self.config.mg_block_smoother != "line":
                raise ValueError(
                    "mg_smoother='chebyshev_fused' implements the 'line' "
                    "block smoother only"
                )
            if mesh is not None:
                raise ValueError(
                    "mg_smoother='chebyshev_fused' is incompatible with the "
                    "sp-sharded solve (halo-extended fine coefficients)"
                )
        if evolution and self.config.mg_normal_op != "factored":
            # evolution equation rows reference the previous time step; the
            # assembled block-stencil AtA (ops/normal_stencil.py) assumes
            # same-point entries, but the factored A^T(A x) structured path
            # models the shift exactly (ops/structured.py) — fall back.
            # Reference MultiGridSolver builds evolution systems the same
            # matrix-free way (reference solver/multigrid.py:84-108).
            self.config = dataclasses.replace(self.config, mg_normal_op="factored")
        msd = self.config.mg_solve_dtype
        if msd == "auto":
            msd = "f32" if jax.default_backend() == "tpu" else "solver"
        if msd not in ("f32", "solver"):
            raise ValueError(f"unknown mg_solve_dtype {msd!r}")
        self.solve_dtype = jnp.float32 if msd == "f32" else self.dtype

        # grid hierarchy
        dims = np.array(coord_dims)
        self.dim_list: List[Tuple[int, ...]] = []
        for _ in range(n_grid):
            assert dims.min() >= 6, f"grid {tuple(dims)} too small for 5-pt stencils"
            self.dim_list.append(tuple(int(d) for d in dims))
            if downsample_first:
                dims = dims // 2
            else:
                dims = dims.copy()
                dims[1:] = dims[1:] // 2

        self.systems: List[PDESystem] = [
            PDESystem.build(
                d, order=order, init_index_mi_list=self.init_index_mi_list,
                n_iv=n_iv, step_size=0.01, evolution=evolution,
            )
            for d in self.dim_list
        ]

        # gather-free structured matvec closures per level (f32 for the
        # preconditioner, solve dtype for the fine level)
        self._sops32 = [make_structured_ops(sysk.spec, self.pdtype) for sysk in self.systems]
        self._sops = [make_structured_ops(sysk.spec, self.dtype) for sysk in self.systems]
        # assembled block-stencil AtA per level (config.mg_normal_op); not
        # built for evolution systems (previous-time-step equation entries —
        # the factored fallback above handles them)
        self._nstencil = (
            None if evolution
            else [make_normal_stencil_ops(sysk.spec) for sysk in self.systems]
        )

        # per-level fused-smoother eligibility (ops/fused_smoother.py):
        # needs a 2D+ grid and all kernel operands inside the ~16 MB/core
        # VMEM budget (stored operators at vdtype + ~6 f32 iteration
        # vectors); ineligible levels run the XLA chebyshev path
        self._fused_lvl = [False] * self.n_grid
        self._fused_kernels: Dict[Tuple[int, int, bool], Any] = {}
        if self._fused_smoother:
            csz = jnp.dtype(self.vdtype).itemsize
            bsz = jnp.dtype(self.binv_dtype).itemsize
            for k, sysk in enumerate(self.systems):
                dims = self.dim_list[k]
                if len(dims) < 2:
                    continue
                desc = self._nstencil[k][0]
                m, N = desc.n_mi, desc.grid_size
                bw = dims[0] * m
                S = N // dims[0]
                op_bytes = desc.n_channels * N * csz + bw * bw * S * bsz
                vec_bytes = 6 * m * N * 4
                self._fused_lvl[k] = op_bytes + vec_bytes < 14 * 2**20

        # ---- explicit sp-sharding of the fine level (scaling path for
        # single patches that outgrow one chip; SURVEY 5.7/5.8).  The fine
        # stencil apply runs as a shard_map with ppermute halo exchange over
        # grid axis 0 (parallel/sharded_normal.py); the coefficient halo is
        # exchanged once per solve.  Everything else (smoother einsums,
        # Chebyshev AXPYs, dots, transfers, the small coarse levels) is left
        # to GSPMD propagation from the operand shardings.
        self.mesh = mesh
        self.sp_axis = sp_axis
        self._shard_ops = None
        if mesh is not None:
            if self.config.mg_normal_op != "stencil":
                raise ValueError(
                    "sp-sharded solve requires mg_normal_op='stencil' "
                    f"(got {self.config.mg_normal_op!r})"
                )
            if self.config.mg_block_smoother != "point":
                raise ValueError(
                    "sp-sharded solve requires mg_block_smoother='point': "
                    "'line' blocks span grid axis 0, which is the sharded "
                    "axis (each time-line would straddle shards)"
                )
            from mech_nn_discovery_pde_tpu.parallel.sharded_normal import (
                make_sharded_flat_ops,
            )

            self._shard_ops = make_sharded_flat_ops(
                mesh, self._nstencil[0][0], sp_axis
            )

        # transfer matrices between consecutive levels (per axis)
        self._down = [
            [interp_matrix(o, n) for o, n in zip(self.dim_list[k], self.dim_list[k + 1])]
            for k in range(n_grid - 1)
        ]
        self._up = [
            [interp_matrix(n, o) for o, n in zip(self.dim_list[k], self.dim_list[k + 1])]
            for k in range(n_grid - 1)
        ]
        # iv-box transfer matrices per transition per box
        self._iv_down = []
        for k in range(n_grid - 1):
            mats_per_box = []
            for f in self.init_index_mi_list:
                _, _, b_old, e_old = f(*self.dim_list[k])
                _, _, b_new, e_new = f(*self.dim_list[k + 1])
                old_shape = np.asarray(e_old) + 1 - np.asarray(b_old)
                new_shape = np.asarray(e_new) + 1 - np.asarray(b_new)
                mats_per_box.append(
                    [interp_matrix(int(o), int(n)) for o, n in zip(old_shape, new_shape)]
                )
            self._iv_down.append(mats_per_box)

    # ------------------------------------------------------------------
    # data downsampling (level k -> k+1); batched (leading bs axis)
    # ------------------------------------------------------------------

    def downsample_coeffs(self, k: int, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(bs, grid_k, n_mi) -> (bs, grid_{k+1}, n_mi)."""
        bs = coeffs.shape[0]
        n_mi = self.systems[k].var_set.n_mi
        x = coeffs.reshape((bs,) + self.dim_list[k] + (n_mi,))
        x = apply_separable(x, self._down[k], offset=1)
        return x.reshape(bs, -1, n_mi)

    def downsample_rhs(self, k: int, rhs: jnp.ndarray) -> jnp.ndarray:
        bs = rhs.shape[0]
        x = rhs.reshape((bs,) + self.dim_list[k])
        x = apply_separable(x, self._down[k], offset=1)
        return x.reshape(bs, -1)

    def downsample_steps(self, k: int, steps_list):
        """Pairwise-sum step downsampling (reference :271-285): drop the last
        step, then sum adjacent pairs."""
        out = []
        for c, steps in enumerate(steps_list):
            old = self.dim_list[k][c]
            new = self.dim_list[k + 1][c]
            if new == old:  # coord not coarsened (downsample_first=False, c=0)
                out.append(steps)
            else:
                s = steps[:, : 2 * (new - 1) + 1][:, :-1]
                out.append(s.reshape(steps.shape[0], new - 1, 2).sum(axis=-1))
        return out

    def downsample_iv(self, k: int, iv_rhs: Optional[jnp.ndarray]):
        if iv_rhs is None or iv_rhs.shape[-1] == 0:
            return iv_rhs
        bs = iv_rhs.shape[0]
        parts = []
        offset = 0
        for bi, f in enumerate(self.init_index_mi_list):
            _, _, b_old, e_old = f(*self.dim_list[k])
            old_shape = tuple(int(e - b + 1) for b, e in zip(b_old, e_old))
            size = int(np.prod(old_shape))
            box = iv_rhs[:, offset : offset + size].reshape((bs,) + old_shape)
            offset += size
            box = apply_separable(box, self._iv_down[k][bi], offset=1)
            parts.append(box.reshape(bs, -1))
        return jnp.concatenate(parts, axis=1)

    # ------------------------------------------------------------------
    # hierarchy setup
    # ------------------------------------------------------------------

    def _level_precond_data(self, k: int, values: jnp.ndarray) -> Dict[str, Any]:
        """Per-level smoother data in preconditioner dtype (batched).

        The smoother preconditioner is point-block Jacobi: the (n_mi x n_mi)
        AtA diagonal block at each grid point is Cholesky-factored (batched
        tiny factorizations — ideal TPU work).  The mi-variables at a point
        are strongly coupled through the equation row and the central
        stencils, so block inversion is far stronger than scalar Jacobi and
        is the TPU-parallel stand-in for the reference's sequential
        Gauss-Seidel sweeps (multigrid.py:399-405)."""
        sysk = self.systems[k]
        v32 = values.astype(self.pdtype)
        use_line = self.config.mg_block_smoother == "line"

        def blocks_one(vals):
            if use_line:
                B = sysk.assemble_line_blocks(vals, axis=0)
            else:
                B = sysk.assemble_point_blocks(vals)
            nb = B.shape[-1]
            d = jnp.diagonal(B, axis1=-2, axis2=-1)
            ridge = 1e-6 * jnp.maximum(jnp.max(d, axis=-1, keepdims=True), 1e-30)
            B = B + ridge[..., None] * jnp.eye(nb, dtype=B.dtype)
            # explicit inverse: the smoother applies B^-1 ~40x per solve and
            # XLA's batched small triangular solves run at ~20 GFlops; a
            # precomputed inverse turns every apply into one batched MXU
            # matmul (measured ~20x faster per apply)
            L = jnp.linalg.cholesky(B)
            eye = jnp.broadcast_to(jnp.eye(nb, dtype=B.dtype), B.shape)
            if self._factored_binv:
                # PSD square-root factor instead of the explicit inverse:
                # B^-1 = L^-T L^-1 = W W^T with W = L^-T.  Rounding W to
                # bf16 keeps round(W) round(W)^T PSD by construction; the
                # entrywise-rounded inverse goes indefinite at cond ~2e6
                # (728/1024 GL fine blocks) and collapses the smoother.
                Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
                return jnp.swapaxes(Linv, -1, -2)
            return jax.scipy.linalg.cho_solve((L, True), eye)

        binv = jax.vmap(blocks_one)(v32)
        sv = jax.vmap(lambda v: split_values(sysk.spec, v))(v32)
        # storage cast AFTER f32 assembly/factorization (mg_precond_dtype).
        # Fused-smoother levels store the inverse (or its factor W) COLUMN-
        # major as (bw, n_mi, nt, n_lines) — winv[j][mi, ti, s] =
        # M_s[ti*m+mi, j] — so the kernel's block apply is a static unroll
        # of whole-tensor lane-parallel MACs
        # (ops/fused_smoother._emit_block_apply / _emit_factored_block_apply).
        if self._fused_lvl[k]:
            nt = self.dim_list[k][0]
            n_mi = self.systems[k].var_set.n_mi
            bw = nt * n_mi
            b2 = jnp.transpose(binv, (0, 3, 2, 1))  # (bs, j, i, n_lines)
            b2 = b2.reshape(b2.shape[0], bw, nt, n_mi, -1)  # i -> (ti, mi)
            binv = jnp.transpose(b2, (0, 1, 3, 2, 4))  # (bs, j, mi, ti, n)
        lvl = {"values": v32, "sv": sv, "binv": binv.astype(self.binv_dtype)}
        if self.config.mg_normal_op in ("stencil", "stencil_pallas"):
            _, build, _ = self._nstencil[k]
            lvl["coef"] = jax.vmap(build)(sv).astype(self.vdtype)
            if k == 0 and self._shard_ops is not None:
                extend, _ = self._shard_ops
                # halo-extended coefficient fields, exchanged once per solve
                lvl["coef"] = jax.vmap(extend)(lvl["coef"])
        lvl["lmax"] = self._estimate_lmax(k, lvl)
        return lvl

    def _normal_apply(self, k: int, lvl, v: jnp.ndarray) -> jnp.ndarray:
        """(AtA) v on level k from per-sample smoother data: assembled
        block-stencil apply (default; XLA or Pallas) or factored A^T (A v)
        fallback."""
        op = self.config.mg_normal_op
        if op == "stencil_pallas":
            from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
                normal_stencil_matvec_pallas,
            )

            return normal_stencil_matvec_pallas(
                self._nstencil[k][0], lvl["coef"], v
            )
        if op == "stencil":
            if k == 0 and self._shard_ops is not None:
                return self._shard_ops[1](lvl["coef"], v)  # haloed coef
            _, _, apply_ = self._nstencil[k]
            return apply_(lvl["coef"], v)
        smv, srmv = self._sops32[k]
        return srmv(lvl["sv"], smv(lvl["sv"], v))

    def _block_apply(self, sysk: PDESystem, binv, r, transposed: bool = False):
        """Apply the block-Jacobi preconditioner r -> B^{-1} r via the
        precomputed explicit inverses (one batched matmul).  Blocks are
        time-lines (all (t, mi) unknowns of one spatial column; the
        TPU-parallel analogue of Gauss-Seidel's time-directional sweep) or
        single grid points, per config.mg_block_smoother.  `transposed`
        marks the fused-smoother (bw, n_mi, nt, n_lines) column-major
        storage layout (winv[j][mi, ti, s] = B^{-1}_s[ti*m+mi, j])."""
        hi = jax.lax.Precision.HIGHEST
        if self.config.mg_block_smoother == "line":
            rb = sysk.line_vec_to_blocks(r, axis=0)
            if transposed:
                if self._factored_binv:
                    # binv holds W column-major (w[j, mi, ti, n] =
                    # W_n[ti*m+mi, j]); apply B^-1 r = W (W^T r)
                    nt = binv.shape[2]
                    m = binv.shape[1]
                    rb3 = rb.reshape(rb.shape[0], nt, m)
                    u = jnp.einsum("jmtn,ntm->nj", binv, rb3, precision=hi)
                    z = jnp.einsum("jmtn,nj->ntm", binv, u, precision=hi)
                else:
                    # out[n, i=ti*m+mi] = sum_j winv[j, mi, ti, n] rb[n, j]
                    z = jnp.einsum("jmtn,nj->ntm", binv, rb, precision=hi)
                z = z.reshape(z.shape[0], -1)
            elif self._factored_binv:
                u = jnp.einsum("nij,ni->nj", binv, rb, precision=hi)
                z = jnp.einsum("nij,nj->ni", binv, u, precision=hi)
            else:
                z = jnp.einsum("nij,nj->ni", binv, rb, precision=hi)
            return sysk.line_blocks_to_vec(z, axis=0)
        n_mi = sysk.var_set.n_mi
        rb = r.reshape(-1, n_mi)
        if self._factored_binv:
            u = jnp.einsum("nij,ni->nj", binv, rb, precision=hi)
            z = jnp.einsum("nij,nj->ni", binv, u, precision=hi)
        else:
            z = jnp.einsum("nij,nj->ni", binv, rb, precision=hi)
        return z.reshape(-1)

    def _estimate_lmax(self, k: int, lvl, iters: int = 20):
        """Power iteration on B^-1 AtA (batched), biased HIGH (30% margin).

        Chebyshev smoothing amplifies any mode above the assumed lmax
        explosively, while overestimating merely weakens smoothing slightly;
        a 10-iteration estimate measured 22% low on the GL system and ruined
        the whole preconditioner (1.3e-1 vs 1.3e-6 relative residual at the
        40-iteration budget)."""
        sysk = self.systems[k]

        def one(lvl_s):
            x = jnp.sin(jnp.arange(sysk.num_vars, dtype=self.pdtype) + 1.0)
            x = x / jnp.linalg.norm(x)

            def body(_, x):
                y = self._block_apply(
                    sysk, lvl_s["binv"], self._normal_apply(k, lvl_s, x),
                    transposed=self._fused_lvl[k],
                )
                return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)

            x = jax.lax.fori_loop(0, iters, body, x)
            y = self._block_apply(
                sysk, lvl_s["binv"], self._normal_apply(k, lvl_s, x),
                transposed=self._fused_lvl[k],
            )
            return jnp.vdot(x, y)

        return self.config.mg_lmax_margin * jax.vmap(one)(lvl)

    @staticmethod
    def _block_row_slices(sys: PDESystem):
        ne, ni = sys.n_eq_rows, sys.n_init_rows
        nc = sys.spec.n_central_rows
        return [(0, ne), (ne, ne + ni), (ne + ni, ne + ni + nc), (ne + ni + nc, sys.n_rows)]

    @staticmethod
    def _block_entry_slices(sys: PDESystem):
        ne, ni = sys.n_eq_entries, sys.n_init_entries
        nc = sys.spec.n_central_entries
        return [
            (0, ne),
            (ne, ne + ni),
            (ne + ni, ne + ni + nc),
            (ne + ni + nc, sys.n_entries),
        ]

    def _probes(self, k: int):
        """Deterministic smooth probe vectors on level k's variable grid."""
        sysk = self.systems[k]
        nmi = sysk.var_set.n_mi
        dims = self.dim_list[k]
        grids = np.indices(dims).astype(np.float64)
        smooth = np.ones(dims)
        lin = np.zeros(dims)
        for c, d in enumerate(dims):
            smooth = smooth * np.sin(np.pi * (grids[c] + 0.5) / d)
            lin = lin + grids[c] / d
        p1 = np.ones(dims + (nmi,)).reshape(-1)
        p2 = np.repeat(smooth[..., None], nmi, axis=-1).reshape(-1)
        p3 = np.repeat(lin[..., None], nmi, axis=-1).reshape(-1)
        return [jnp.asarray(p, self.pdtype) for p in (p1, p2, p3)]

    def _rescale_coarse_values(self, k: int, fine_vals32, coarse_vals32):
        """Per-constraint-block spectral rescaling of level-k values.

        The re-discretized coarse operator is not spectrally equivalent to
        the Galerkin projection P^T A P of the (already-rescaled) finer
        operator: each constraint family mismatches by a different h/row-count
        factor (measured on 2D transport: equation ~4.8x, boundary ~2x,
        central ~0.65x, Taylor ~0.9x), so no single scalar fixes it and the
        raw V-cycle correction diverges.  Matching each block's quadratic
        form on smooth probe vectors — scale block values by
        sqrt(<A_f P v>_block^2 / <A_c v>_block^2) — restores spectral
        equivalence on exactly the smooth subspace the coarse grid handles."""
        sysf, sysc = self.systems[k - 1], self.systems[k]
        probes = self._probes(k)
        rf = self._block_row_slices(sysf)
        rc = self._block_row_slices(sysc)
        ec = self._block_entry_slices(sysc)
        tiny = jnp.finfo(self.pdtype).tiny

        def one(vf, vc):
            qf = [jnp.asarray(0.0, self.pdtype)] * 4
            qc = [jnp.asarray(0.0, self.pdtype)] * 4
            for v in probes:
                Av_f = sysf.matvec(vf, self._prolong_vec(k - 1, v))
                Av_c = sysc.matvec(vc, v)
                for b in range(4):
                    qf[b] = qf[b] + jnp.sum(Av_f[rf[b][0] : rf[b][1]] ** 2)
                    qc[b] = qc[b] + jnp.sum(Av_c[rc[b][0] : rc[b][1]] ** 2)
            parts = []
            for b in range(4):
                s = jnp.sqrt(qf[b] / jnp.maximum(qc[b], tiny))
                s = jnp.where(qc[b] > tiny, s, jnp.ones_like(s))
                parts.append(vc[ec[b][0] : ec[b][1]] * s)
            return jnp.concatenate(parts)

        return jax.vmap(one)(fine_vals32, coarse_vals32)

    def build_hierarchy(
        self, coeffs, rhs, iv_rhs, steps_list, fine_values, ridge: float = 0.0
    ):
        """Build all preconditioner data (stop-gradient).  Returns a pytree
        with leading batch axes throughout:
          levels: list of per-level smoother data (values/dinv/lmax in f32)
          scales: per-transition coarse-correction scale factors
          coarse_factor: batched Cholesky factor (+ equilibration scale)
        """
        sg = jax.lax.stop_gradient
        coeffs, rhs, steps_list = sg(coeffs), sg(rhs), sg(
            [s for s in steps_list]
        )
        iv_rhs = sg(iv_rhs) if iv_rhs is not None else None

        levels = [self._level_precond_data(0, sg(fine_values))]
        for k in range(1, self.n_grid):
            coeffs = self.downsample_coeffs(k - 1, coeffs)
            rhs = self.downsample_rhs(k - 1, rhs)
            steps_list = self.downsample_steps(k - 1, steps_list)
            iv_rhs = self.downsample_iv(k - 1, iv_rhs)
            sysk = self.systems[k]
            values_k = sysk.fill_values(coeffs, steps_list, dtype=self.pdtype)
            # telescoping per-block rescale against the finer (already
            # rescaled) operator
            values_k = self._rescale_coarse_values(
                k, levels[k - 1]["values"], values_k.astype(self.pdtype)
            )
            levels.append(self._level_precond_data(k, values_k))

        # coarsest dense factorization (f32, equilibrated)
        sysc = self.systems[-1]
        vc = levels[-1]["values"]
        ata = jax.vmap(sysc.assemble_normal)(vc)
        if ridge:
            ata = ata + ridge * jnp.eye(sysc.num_vars, dtype=ata.dtype)
        d = jnp.diagonal(ata, axis1=-2, axis2=-1)
        s = jax.lax.rsqrt(jnp.maximum(d, jnp.finfo(ata.dtype).tiny))
        scaled = ata * s[:, :, None] * s[:, None, :]
        scaled = scaled + jnp.asarray(1e-6, scaled.dtype) * jnp.eye(
            sysc.num_vars, dtype=scaled.dtype
        )
        L = jnp.linalg.cholesky(scaled)
        # explicit inverse with the equilibration folded in:
        # AtA^-1 = diag(s) scaled^-1 diag(s); applied ~40x per solve
        # invert in column chunks: one multi-RHS triangular solve over all
        # n columns makes XLA materialize O(n^2) temporaries per block row
        # (measured 19.6G HBM for (32, 3584^2)); chunking bounds the peak
        n = sysc.num_vars
        chunk = min(512, n)
        eye_full = jnp.eye(n, dtype=scaled.dtype)
        cols = []
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            rhs_c = jnp.broadcast_to(
                eye_full[:, c0:c1], (scaled.shape[0], n, c1 - c0)
            )
            cols.append(jax.scipy.linalg.cho_solve((L, True), rhs_c))
        inv = jnp.concatenate(cols, axis=-1)
        coarse_inv = inv * s[:, :, None] * s[:, None, :]
        return {"levels": levels, "coarse_inv": coarse_inv.astype(self.vdtype)}

    # ------------------------------------------------------------------
    # smoothers (single sample, preconditioner dtype)
    # ------------------------------------------------------------------

    def _smooth(self, k: int, lvl, b, x, steps: int, back: bool,
                x0_zero: bool = False, want_residual: bool = False):
        """want_residual: also return b - A x_final, reused from the
        chebyshev recurrence's maintained invariant (config
        mg_smoother_residual) — zero extra applies on the chebyshev/fused
        paths; the jacobi path recomputes it."""
        sysk = self.systems[k]
        apply_B = lambda r: self._block_apply(
            sysk, lvl["binv"], r, transposed=self._fused_lvl[k])
        mv = lambda v: self._normal_apply(k, lvl, v)
        if self._fused_lvl[k]:
            # whole pass as one VMEM-resident Pallas kernel per sample
            # (ops/fused_smoother.py); exactness-tested against the XLA
            # chebyshev branch below
            key = (k, steps, x0_zero, want_residual)
            sm = self._fused_kernels.get(key)
            if sm is None:
                from mech_nn_discovery_pde_tpu.ops.fused_smoother import (
                    make_fused_smoother,
                )

                sm = make_fused_smoother(
                    self._nstencil[k][0], self.dim_list[k], steps,
                    self.config.mg_chebyshev_ratio, x0_zero,
                    emit_residual=want_residual,
                    factored=self._factored_binv,
                )
                self._fused_kernels[key] = sm
            return sm(lvl["coef"], lvl["binv"], b, x, lvl["lmax"])
        if self.config.mg_smoother == "jacobi":
            w = self.config.jacobi_w if back else self.config.jacobi_w_forward
            for _ in range(steps):
                r = b - mv(x)
                x = x + w * apply_B(r)
            if want_residual:
                return x, b - mv(x)
            return x
        # Chebyshev over the block-preconditioned operator on [lmax/r, lmax].
        # Vector arithmetic is f32 regardless of mg_precond_dtype (see
        # precondition()); apply_B/mv promote their bf16-stored operands.
        lmax = lvl["lmax"]
        lmin = lmax / self.config.mg_chebyshev_ratio
        theta = (lmax + lmin) / 2.0
        delta = (lmax - lmin) / 2.0
        sigma = theta / delta
        rho = 1.0 / sigma
        r = b - mv(x)
        d = apply_B(r) / theta
        for i in range(steps):
            x = x + d
            r = r - mv(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * apply_B(r)
            rho = rho_new
        if want_residual:
            return x, r  # invariant: r == b - A x after every iteration
        return x

    # ---- variable-grid transfers (single sample) ----------------------

    def _restrict_vec(self, k: int, r: jnp.ndarray) -> jnp.ndarray:
        sysk = self.systems[k]
        n_mi = sysk.var_set.n_mi
        x = r.reshape(self.dim_list[k] + (n_mi,))
        x = apply_separable(x, self._down[k], offset=0)
        return x.reshape(-1)

    def _prolong_vec(self, k: int, r: jnp.ndarray) -> jnp.ndarray:
        """Level k+1 -> k."""
        sysk1 = self.systems[k + 1]
        n_mi = sysk1.var_set.n_mi
        x = r.reshape(self.dim_list[k + 1] + (n_mi,))
        x = apply_separable(x, self._up[k], offset=0)
        return x.reshape(-1)

    # ------------------------------------------------------------------
    # V-cycle (single sample; hier entries are per-sample slices)
    # ------------------------------------------------------------------

    def v_cycle(self, hier, b, k: int = 0, back: bool = False,
                return_residual: bool = False):
        lvl = hier["levels"][k]
        x = jnp.zeros_like(b)
        if self.config.mg_smoother_residual:
            x, r = self._smooth(k, lvl, b, x,
                                self.config.mg_smoother_steps_pre, back,
                                x0_zero=True, want_residual=True)
        else:
            x = self._smooth(k, lvl, b, x, self.config.mg_smoother_steps_pre,
                             back, x0_zero=True)
            r = b - self._normal_apply(k, lvl, x)
        rH = self._restrict_vec(k, r)
        if k == self.n_grid - 2:
            deltaH = jnp.einsum("ij,j->i", hier["coarse_inv"], rH,
                                precision=jax.lax.Precision.HIGHEST)
        else:
            deltaH = self.v_cycle(hier, rH, k + 1, back)
        # Raw (unit-step) coarse correction.  An energy line search on the
        # correction makes the cycle monotone as a stationary iteration but
        # measurably *degrades* it as an FGMRES preconditioner (10x on 2D
        # transport): Krylov exploits the rich smooth components of the raw
        # correction even when their scale is off.
        x = x + self._prolong_vec(k, deltaH)
        if return_residual:
            # post-smoother invariant r = b - A x: the caller gets the
            # final residual at zero extra applies (see _smooth)
            return self._smooth(k, lvl, b, x,
                                self.config.mg_smoother_steps_post, back,
                                want_residual=True)
        x = self._smooth(k, lvl, b, x, self.config.mg_smoother_steps_post, back)
        return x

    def precondition(self, hier, r: jnp.ndarray, back: bool = False) -> jnp.ndarray:
        """Apply mg_steps V-cycles from a zero guess (reference
        v_cycle_gs_start, :489-498).  Runs in f32; cast at the boundary."""
        n_step = (
            self.config.mg_steps_backward if back else self.config.mg_steps_forward
        )
        # vectors stay f32 even under mg_precond_dtype='bf16': the traffic
        # win is in the STORED operators (binv/coef/coarse_inv reads, 100s of
        # MB per application) — vectors are KB-scale, and bf16 residual
        # arithmetic collapses on stiff operators (measured: steps=0.01 2D
        # transport rel_rnorm 7e-4 -> 0.77 with bf16 vectors; f32 vectors
        # with bf16 storage recover it).  Mixed bf16xf32 einsums read the
        # stored operand at half traffic and promote in-register.
        x = self.v_cycle(hier, r.astype(self.pdtype), 0, back)
        for _ in range(n_step - 1):
            res = r.astype(self.pdtype) - self._normal_apply(
                0, hier["levels"][0], x
            )
            x = x + self.v_cycle(hier, res, 0, back)
        return x.astype(r.dtype)

    def precondition_with_Az(self, hier, r: jnp.ndarray, back: bool = False):
        """Fused preconditioner + matvec for flexible GMRES: returns
        (z, A z) where A z = r - res_final is reconstructed from the
        post-smoother's residual invariant (config mg_fused_matvec) —
        the Krylov loop's entire inner fine-level apply disappears at
        zero extra flops.  The reconstruction telescopes across mg_steps:
        res_{i+1} = res_i - A dx_i, so r - res_final = A sum(dx_i)."""
        n_step = (
            self.config.mg_steps_backward if back else self.config.mg_steps_forward
        )
        rp = r.astype(self.pdtype)
        x, res = self.v_cycle(hier, rp, 0, back, return_residual=True)
        for _ in range(n_step - 1):
            dx, res = self.v_cycle(hier, res, 0, back, return_residual=True)
            x = x + dx
        return x.astype(r.dtype), (rp - res).astype(r.dtype)

    # ------------------------------------------------------------------
    # FGMRES solve on the fine normal equations (batched)
    # ------------------------------------------------------------------

    def solve_normal(
        self, fine_values, rhs_vec, hier, back: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Solve AtA x = At rhs (forward) or AtA dz = g (backward, rhs_vec
        already in variable space).  Returns (x, iters, rnorm)."""
        cfg = self.config
        sys0 = self.systems[0]
        restart = cfg.mg_fgmres_restarts_backward if back else cfg.mg_fgmres_restarts_forward
        maxiter = cfg.mg_fgmres_max_iter_backward if back else cfg.mg_fgmres_max_iter_forward

        if back:
            atb = rhs_vec
        else:
            atb = jax.vmap(sys0.rmatvec_s)(fine_values, rhs_vec)

        sdt = self.solve_dtype
        fmv, frmv = self._sops[0] if sdt == self.dtype else self._sops32[0]
        out_dtype = atb.dtype

        def fine_normal_op(vals):
            """AtA matvec closure on the fine level in the solve dtype."""
            sv = split_values(sys0.spec, vals.astype(sdt))
            if cfg.mg_normal_op in ("stencil", "stencil_pallas"):
                desc, build, apply_ = self._nstencil[0]
                coef = build(sv)
                if self._shard_ops is not None:
                    extend, s_apply = self._shard_ops
                    coef_h = extend(coef)  # halo exchanged once per solve
                    return lambda v: s_apply(coef_h, v)
                if cfg.mg_normal_op == "stencil_pallas":
                    from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
                        normal_stencil_matvec_pallas,
                    )

                    return lambda v: normal_stencil_matvec_pallas(desc, coef, v)
                return lambda v: apply_(coef, v)
            return lambda v: frmv(sv, fmv(sv, v))

        def solve_one(vals, b, hier_s):
            pmv = None
            if cfg.mg_fused_matvec:
                pmv = lambda r: self.precondition_with_Az(hier_s, r, back=back)
            res = krylov.fgmres(
                fine_normal_op(vals),
                b.astype(sdt),
                precond=lambda r: self.precondition(hier_s, r, back=back),
                restart=restart,
                maxiter=maxiter,
                atol=cfg.mg_fgmres_tol,
                tol=cfg.mg_fgmres_tol,
                precond_matvec=pmv,
            )
            return res.x.astype(out_dtype), res.iters, res.rnorm.astype(out_dtype)

        return jax.vmap(solve_one)(fine_values, atb, hier)


class MultigridNormalSolver:
    """LstsqInnerSolver adapter (see ops/normal_solve.py): forward/backward
    FGMRES+MG with separate budgets, factor and hierarchy reused in backward
    (reference qp_dual_sparse_multigrid_normal_kkt.py:51-101)."""

    def __init__(self, mg: MultigridSolver):
        self.mg = mg

    def solve(self, values, rhs, pdata):
        x, iters, rnorm = self.mg.solve_normal(values, rhs, pdata, back=False)
        return x, (pdata, iters, rnorm)

    def stats(self, aux):
        """Per-sample FGMRES iteration counts / residual norms of the forward
        solve (consumed by make_lstsq_solve's stats callback)."""
        return {"iters": aux[1], "fgmres_rnorm": aux[2]}

    def resolve(self, values, g, aux, backward: bool):
        pdata = aux[0]
        dz, _, _ = self.mg.solve_normal(values, g, pdata, back=True)
        return dz

"""MultigridLayer: the sparse-path differentiable PDE layer.

Drop-in swap for PDEDenseLayer (identical call contract; reference
MultigridLayer, solver/multigrid.py:536-623): same
(coeffs, rhs, iv_rhs, steps_list) -> (u0, u, eps), but the solve is
FGMRES on the matrix-free normal equations, preconditioned by a geometric
multigrid V-cycle over re-discretized coarse grids.  Intended for large
grids where dense Cholesky is infeasible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mech_nn_discovery_pde_tpu.config import PDEConfig, default_config
from mech_nn_discovery_pde_tpu.ops.normal_solve import (
    default_stats_fn,
    make_lstsq_solve,
)
from mech_nn_discovery_pde_tpu.solvers.multigrid import (
    MultigridNormalSolver,
    MultigridSolver,
)


class MultigridLayer:
    def __init__(
        self,
        bs: int,
        coord_dims: Sequence[int],
        order: int = 2,
        n_ind_dim: int = 1,
        n_iv: int = 1,
        init_index_mi_list=None,
        n_iv_steps: int = 1,
        solver_dbl: bool = True,
        double_ret: bool = False,
        evolution: bool = False,
        downsample_first: bool = True,
        n_grid: int = 2,
        gamma: float = 0.5,
        alpha: float = 0.1,
        config: Optional[PDEConfig] = None,
        device=None,
        mesh=None,
        sp_axis: str = "sp",
    ):
        """`mesh` (jax.sharding.Mesh, optional): explicitly sp-shard the fine
        level over `mesh.shape[sp_axis]` devices — grid axis 0 is split, the
        fine stencil apply runs as shard_map + ppermute halo exchange, and
        the rest of the solve partitions by GSPMD propagation.  Requires
        mg_normal_op='stencil' and mg_block_smoother='point'."""
        del n_iv_steps, gamma, alpha, double_ret, device
        self.bs = bs
        self.coord_dims = tuple(coord_dims)
        self.n_coord = len(self.coord_dims)
        self.order = order
        self.n_ind_dim = n_ind_dim
        self.n_iv = n_iv
        self.config = config or default_config
        self.solver_dbl = solver_dbl

        self.mg_solver = MultigridSolver(
            bs=bs * n_ind_dim,
            order=order,
            n_ind_dim=n_ind_dim,
            n_iv=n_iv,
            init_index_mi_list=init_index_mi_list or [],
            coord_dims=self.coord_dims,
            solver_dbl=solver_dbl,
            evolution=evolution,
            downsample_first=downsample_first,
            n_grid=n_grid,
            config=self.config,
            mesh=mesh,
            sp_axis=sp_axis,
        )
        self.system = self.mg_solver.systems[0]
        self.n_orders = self.system.var_set.n_mi
        self.grid_size = self.system.var_set.grid_size
        self.dtype = self.mg_solver.dtype

        self.inner = MultigridNormalSolver(self.mg_solver)
        stats_fn = None
        if self.config.log_solves or self.config.check_finite:
            from mech_nn_discovery_pde_tpu.ops.normal_solve import (
                host_callbacks_supported,
            )

            if host_callbacks_supported():
                stats_fn = default_stats_fn(check_finite=self.config.check_finite)
            else:
                import logging

                logging.getLogger("pde").warning(
                    "log_solves/check_finite requested but this backend does "
                    "not support host callbacks (axon tunnel) — per-solve "
                    "diagnostics disabled; use layer.solve_stats() instead"
                )
        self._solve = make_lstsq_solve(
            self.system, self.inner, stats_fn=stats_fn,
            return_stats=self.config.return_solve_stats,
        )

    def _prepare(self, coeffs, rhs, iv_rhs, steps_list):
        b = self.bs * self.n_ind_dim
        coeffs = coeffs.reshape(b, self.grid_size, self.n_orders).astype(self.dtype)
        rhs = rhs.reshape(b, self.grid_size).astype(self.dtype)
        if iv_rhs is not None:
            iv_rhs = iv_rhs.reshape(b, -1).astype(self.dtype)
        steps_list = [
            steps_list[i].reshape(b, self.coord_dims[i] - 1).astype(self.dtype)
            for i in range(self.n_coord)
        ]
        values = self.system.fill_values(coeffs, steps_list, dtype=self.dtype)
        rhs_vec = self.system.fill_rhs(rhs, iv_rhs, dtype=self.dtype)
        hier = self.mg_solver.build_hierarchy(coeffs, rhs, iv_rhs, steps_list, values)
        return values, rhs_vec, hier

    def __call__(self, coeffs, rhs, iv_rhs, steps_list):
        values, rhs_vec, hier = self._prepare(coeffs, rhs, iv_rhs, steps_list)

        if self.config.return_solve_stats:
            x, stats = self._solve(values, rhs_vec, hier)
        else:
            x, stats = self._solve(values, rhs_vec, hier), None

        u = self.system.solution_reshaped(x)
        u = u.reshape(self.bs, self.n_ind_dim, self.grid_size, self.n_orders)
        u0 = u[..., 0]
        # third slot is eps=None in the reference contract; with
        # return_solve_stats it carries the in-band forward-solve stats
        # (per-sample FGMRES iters + normal-equation residuals)
        return u0, u, stats

    def backward_stats(self, coeffs, rhs, iv_rhs, steps_list, g):
        """Periodic backward-solve diagnostic for callback-free backends
        (axon): solve AtA dz = g with the backward budgets (hierarchy built
        fresh, no forward solve needed) and report residual quality —
        parity with the reference's per-backward logging
        (qp_dual_sparse_multigrid_normal_kkt.py:105-107).  Intended every K
        epochs, not per step."""
        values, _, hier = self._prepare(coeffs, rhs, iv_rhs, steps_list)
        g = g.reshape(values.shape[0], -1).astype(self.dtype)
        dz, iters, rnorm = self.mg_solver.solve_normal(values, g, hier, back=True)
        gn = jnp.maximum(jnp.linalg.norm(g, axis=1), 1e-30)
        return {
            "iters": iters,
            "rnorm": rnorm,
            "rel_rnorm": rnorm / gn,
            "finite": jnp.isfinite(dz).all(axis=1),
        }

    def solve_stats(self, coeffs, rhs, iv_rhs, steps_list):
        """Diagnostic solve returning per-sample FGMRES iteration counts and
        absolute/relative residual norms (the reference logs these every
        solve, qp_dual_sparse...:59-60).  Not differentiable; use for
        monitoring/tuning."""
        values, rhs_vec, hier = self._prepare(coeffs, rhs, iv_rhs, steps_list)
        x, iters, rnorm = self.mg_solver.solve_normal(values, rhs_vec, hier)
        atb = jax.vmap(self.system.rmatvec)(values, rhs_vec)
        bnorm = jnp.linalg.norm(atb, axis=1)
        return {
            "iters": iters,
            "rnorm": rnorm,
            "rel_rnorm": rnorm / jnp.maximum(bnorm, 1e-30),
        }

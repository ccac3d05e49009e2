"""PDEDenseLayer: the dense-path differentiable PDE-solving layer.

API parity with reference solver/pde_layer_dense.py:38-125:

    layer = PDEDenseLayer(bs, coord_dims=..., order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=[...], n_iv_steps=1,
                          solver_dbl=True)
    u0, u, eps = layer(coeffs, rhs, iv_rhs, steps_list)

  coeffs:  (bs, n_ind_dim?, grid_size, n_orders) full coefficient grids
  rhs:     (bs, ..., grid_size) source term on the full grid
  iv_rhs:  (bs, ..., n_boundary_rows) boundary/initial values, concatenated
           per init box in box C-order (or None)
  steps_list: one (bs, ..., dim_c - 1) positive step vector per coordinate

Returns u0 = u[..., 0] (function values, shape (bs, n_ind_dim, grid_size)),
u = full solution (bs, n_ind_dim, grid_size, n_orders), eps = None.

The layer is a static-structure object: construct once, then call inside a
jitted/grad-ed function.  All compute is pure JAX; batching over bs*n_ind_dim
is via vmapped solvers, not block-diagonal stacking.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from mech_nn_discovery_pde_tpu.config import PDEConfig, default_config
from mech_nn_discovery_pde_tpu.ops.normal_solve import (
    default_stats_fn,
    make_lstsq_solve,
)
from mech_nn_discovery_pde_tpu.ops.system import PDESystem
from mech_nn_discovery_pde_tpu.solvers.cholesky import DenseNormalSolver


class PDEDenseLayer:
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
        gamma: float = 0.5,
        alpha: float = 0.1,
        config: Optional[PDEConfig] = None,
        device=None,
    ):
        del n_iv_steps, gamma, alpha, device  # API parity only
        self.bs = bs
        self.coord_dims = tuple(coord_dims)
        self.n_coord = len(self.coord_dims)
        self.order = order
        self.n_ind_dim = n_ind_dim
        self.n_iv = n_iv
        self.solver_dbl = solver_dbl
        self.double_ret = double_ret
        self.config = config or default_config

        self.system = PDESystem.build(
            self.coord_dims,
            order=order,
            init_index_mi_list=init_index_mi_list or [],
            n_iv=n_iv,
            step_size=0.01,
            evolution=evolution,
        )
        self.n_orders = self.system.var_set.n_mi
        self.grid_size = self.system.var_set.grid_size

        if solver_dbl:
            precision = self.config.precision
            if precision == "auto":
                # TPU f64 is software-emulated (~50-150x slower); the
                # validated TPU configuration is f32 factorization +
                # f64-residual refinement
                precision = "f32_ir" if jax.default_backend() == "tpu" else "f64"
            self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        else:
            precision = "f32"
            self.dtype = jnp.float32
        if precision not in ("f64", "f32_ir", "f32"):
            raise ValueError(
                f"unknown precision {precision!r}; expected 'auto', 'f64', "
                "'f32_ir' or 'f32'"
            )
        if not jax.config.jax_enable_x64 and precision in ("f64", "f32_ir"):
            precision = "f32"

        self.inner = DenseNormalSolver(
            self.system, precision=precision, ir_steps=self.config.ir_steps
        )
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

    # ------------------------------------------------------------------

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
        return values, rhs_vec

    def __call__(self, coeffs, rhs, iv_rhs, steps_list):
        values, rhs_vec = self._prepare(coeffs, rhs, iv_rhs, steps_list)

        if self.config.return_solve_stats:
            x, stats = self._solve(values, rhs_vec, None)
        else:
            x, stats = self._solve(values, rhs_vec, None), None

        u = self.system.solution_reshaped(x)
        u = u.reshape(self.bs, self.n_ind_dim, self.grid_size, self.n_orders)
        u0 = u[..., 0]
        # third slot is eps=None in the reference contract; with
        # return_solve_stats it carries the in-band forward-solve stats
        return u0, u, stats

    def backward_stats(self, coeffs, rhs, iv_rhs, steps_list, g):
        """Periodic backward-solve diagnostic for callback-free backends
        (axon): solve AtA dz = g with the backward budgets and report the
        residual quality, mirroring the reference's per-backward logging
        (qp_dual_dense_normal_kkt.py:105-107).  `g` is an output cotangent
        of shape (bs*n_ind_dim, num_vars) — e.g. the u-gradient of the loss
        head, scattered to mi slot 0.  Runs one factorization + solve;
        intended every K epochs, not per step."""
        values, rhs_vec = self._prepare(coeffs, rhs, iv_rhs, steps_list)
        _, aux = self.inner.solve(values, rhs_vec)
        g = g.reshape(values.shape[0], -1).astype(self.dtype)
        dz = self.inner.resolve(values, g, aux, backward=True)
        res = g - jax.vmap(self.system.normal_matvec_s)(values, dz)
        rn = jnp.linalg.norm(res, axis=1)
        gn = jnp.maximum(jnp.linalg.norm(g, axis=1), 1e-30)
        return {
            "rnorm": rn,
            "rel_rnorm": rn / gn,
            "finite": jnp.isfinite(dz).all(axis=1),
        }

    def solve_stats(self, coeffs, rhs, iv_rhs, steps_list):
        """Diagnostic solve: per-sample normal-equation residual norms and a
        finiteness flag.  The failure-detection analogue of the reference's
        cholesky_ex(check_errors=True) hard-fail (qp_dual_dense...:39) —
        JAX Cholesky yields NaN on indefinite input instead of raising, so
        callers monitor this."""
        values, rhs_vec = self._prepare(coeffs, rhs, iv_rhs, steps_list)
        x, _ = self.inner.solve(values, rhs_vec)
        atb = jax.vmap(self.system.rmatvec_s)(values, rhs_vec)
        res = atb - jax.vmap(self.system.normal_matvec_s)(values, x)
        rnorm = jnp.linalg.norm(res, axis=1)
        bnorm = jnp.maximum(jnp.linalg.norm(atb, axis=1), 1e-30)
        return {
            "rnorm": rnorm,
            "rel_rnorm": rnorm / bnorm,
            "finite": jnp.isfinite(x).all(axis=1),
        }

"""Differentiable equality-constrained least-squares solve (IFT backward).

Solves  min_x ||A(theta) x - b||^2  via the normal equations
AtA x = At b, with a custom VJP implementing the implicit function theorem:

  dz   = (AtA)^{-1} g            (reuses the forward factorization / solver)
  A_bar[r, c] = dz[c] lam[r] - (A dz)[r] x[c],   lam = b - A x
  b_bar = A dz

restricted to the static sparsity of A — a pair of gathers per entry, no
sparse outer products (reference sparse_grad_eq_constraint /
sparse_grad_derivative_constraint, lp_pde_central_diff.py:1971-2078, and the
dense/sparse QPFunction backward passes qp_dual_dense_normal_kkt.py:58-118,
qp_dual_sparse_multigrid_normal_kkt.py:81-162).

Gradients w.r.t. coefficients and step sizes flow through the (outside)
jitted fill functions by ordinary autodiff, exactly as in the reference.

Inner solvers implement the `LstsqInnerSolver` protocol; the dense batched
Cholesky solver lives in solvers/cholesky.py and the multigrid-FGMRES solver
in solvers/multigrid.py.
"""

from __future__ import annotations

from typing import Any, Protocol, Tuple

import jax
import jax.numpy as jnp

from mech_nn_discovery_pde_tpu.ops.system import PDESystem


class LstsqInnerSolver(Protocol):
    def solve(
        self, values: jnp.ndarray, rhs: jnp.ndarray, pdata: Any
    ) -> Tuple[jnp.ndarray, Any]:
        """Forward solve: (bs, n_entries), (bs, n_rows) -> (x (bs, num_vars),
        aux) where aux carries whatever the backward solve wants to reuse
        (factors, hierarchies, ...).  `pdata` is opaque preconditioner data
        built by the caller (None for direct solvers)."""
        ...

    def resolve(
        self, values: jnp.ndarray, g: jnp.ndarray, aux: Any, backward: bool
    ) -> jnp.ndarray:
        """Solve AtA dz = g reusing `aux` (backward budgets if backward)."""
        ...


def make_lstsq_solve(system: PDESystem, inner: LstsqInnerSolver):
    """Build the custom-VJP batched solve function for one PDESystem.

    Signature of the returned function: solve(values, rhs, pdata) -> x, where
    pdata is non-differentiated auxiliary data (e.g. the multigrid hierarchy;
    preconditioning affects convergence only, so its cotangent is zero —
    matching the reference, which builds coarse grids inside the
    autograd.Function forward, outside the tape)."""

    matvec_b = jax.vmap(system.matvec_s)

    @jax.custom_vjp
    def lstsq_solve(values, rhs, pdata):
        x, _ = inner.solve(values, rhs, pdata)
        return x

    def fwd(values, rhs, pdata):
        x, aux = inner.solve(values, rhs, pdata)
        lam = rhs - matvec_b(values, x)
        return x, (values, x, lam, aux, pdata)

    def bwd(res, g):
        values, x, lam, aux, pdata = res
        dz = inner.resolve(values, g, aux, backward=True)
        w = matvec_b(values, dz)  # A dz
        rows = system.rows_all
        cols = system.cols_all
        values_bar = (
            jnp.take(lam, rows, axis=1) * jnp.take(dz, cols, axis=1)
            - jnp.take(w, rows, axis=1) * jnp.take(x, cols, axis=1)
        )
        pdata_bar = jax.tree.map(jnp.zeros_like, pdata)
        return values_bar.astype(values.dtype), w.astype(g.dtype), pdata_bar

    lstsq_solve.defvjp(fwd, bwd)
    return lstsq_solve

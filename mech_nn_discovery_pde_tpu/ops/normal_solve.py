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


def make_lstsq_solve(system: PDESystem, inner: LstsqInnerSolver, stats_fn=None,
                     return_stats: bool = False):
    """Build the custom-VJP batched solve function for one PDESystem.

    Signature of the returned function: solve(values, rhs, pdata) -> x
    (or (x, stats) with return_stats=True), where pdata is
    non-differentiated auxiliary data (e.g. the multigrid hierarchy;
    preconditioning affects convergence only, so its cotangent is zero —
    matching the reference, which builds coarse grids inside the
    autograd.Function forward, outside the tape).

    Per-solve diagnostics (parity with the reference's per-solve residual
    logging, qp_dual_sparse_multigrid_normal_kkt.py:59-60,105-107), two
    delivery modes:

    - `stats_fn`: invoked host-side via jax.debug.callback after every
      forward AND backward solve as stats_fn(phase, stats).  Needs host
      callbacks — unavailable on the axon TPU backend.
    - `return_stats=True`: forward-solve stats are returned IN-BAND as a
      second output (jit outputs; zero cotangent), so flagship TPU runs can
      log per-step forward convergence with no host callback and no
      re-solve.  Backward-solve stats cannot ride an output (they only
      exist inside the VJP); on callback-free backends use the layers'
      `backward_stats()` periodic diagnostic.

    The stats dict: 'rnorm' / 'rel_rnorm' (normal-equation residual),
    'finite', plus any solver-specific entries via inner.stats(aux)
    (e.g. FGMRES 'iters')."""

    matvec_b = jax.vmap(system.matvec_s)
    rmatvec_b = jax.vmap(system.rmatvec_s)
    normal_b = jax.vmap(system.normal_matvec_s)

    def _emit(phase, stats):
        import functools

        jax.debug.callback(functools.partial(stats_fn, phase), stats)

    def _fwd_stats(values, rhs, x, lam, aux):
        # A^T lam = At b - AtA x: the normal-equation residual, two
        # cheap matvecs on top of the solve
        rn = jnp.linalg.norm(rmatvec_b(values, lam), axis=1)
        bn = jnp.linalg.norm(rmatvec_b(values, rhs), axis=1)
        stats = {
            "rnorm": rn,
            "rel_rnorm": rn / jnp.maximum(bn, 1e-30),
            "finite": jnp.isfinite(x).all(axis=1),
        }
        extra = getattr(inner, "stats", None)
        if extra is not None:
            stats.update(extra(aux))
        return stats

    @jax.custom_vjp
    def lstsq_solve(values, rhs, pdata):
        x, aux = inner.solve(values, rhs, pdata)
        if return_stats:
            lam = rhs - matvec_b(values, x)
            return x, _fwd_stats(values, rhs, x, lam, aux)
        return x

    def fwd(values, rhs, pdata):
        x, aux = inner.solve(values, rhs, pdata)
        lam = rhs - matvec_b(values, x)
        stats = None
        if stats_fn is not None or return_stats:
            stats = _fwd_stats(values, rhs, x, lam, aux)
            if stats_fn is not None:
                _emit("forward", stats)
        out = (x, stats) if return_stats else x
        return out, (values, x, lam, aux, pdata)

    def bwd(res, g):
        values, x, lam, aux, pdata = res
        if return_stats:
            g = g[0]  # stats output takes zero cotangent
        dz = inner.resolve(values, g, aux, backward=True)
        if stats_fn is not None:
            rn = jnp.linalg.norm(g - normal_b(values, dz), axis=1)
            gn = jnp.linalg.norm(g, axis=1)
            _emit(
                "backward",
                {
                    "rnorm": rn,
                    "rel_rnorm": rn / jnp.maximum(gn, 1e-30),
                    "finite": jnp.isfinite(dz).all(axis=1),
                },
            )
        w = matvec_b(values, dz)  # A dz
        rows = system.rows_all
        cols = system.cols_all
        values_bar = (
            jnp.take(lam, rows, axis=1) * jnp.take(dz, cols, axis=1)
            - jnp.take(w, rows, axis=1) * jnp.take(x, cols, axis=1)
        )
        pdata_bar = jax.tree.map(jnp.zeros_like, pdata)
        return values_bar.astype(values.dtype), w.astype(values.dtype), pdata_bar

    lstsq_solve.defvjp(fwd, bwd)
    return lstsq_solve


import functools


@functools.lru_cache(maxsize=1)
def host_callbacks_supported() -> bool:
    """Whether the default backend supports jax.debug.callback.  The 'axon'
    TPU tunnel backend raises UNIMPLEMENTED (no host send/recv callbacks);
    per-solve logging must degrade gracefully there.  Probed live once and
    cached."""
    try:
        def f(x):
            jax.debug.callback(lambda v: None, x)
            return x

        jax.jit(f)(jnp.zeros(())).block_until_ready()
        return True
    except Exception:
        return False


def default_stats_fn(log=None, check_finite: bool = False, name: str = "pde"):
    """Host-side per-solve stats consumer: logs summary norms through the
    package logger and (optionally) raises on non-finite solutions — the
    analogue of the reference's cholesky_ex(check_errors=True) hard-fail
    (qp_dual_dense_normal_kkt.py:39)."""
    import logging

    log = log or logging.getLogger(name)

    def fn(phase, stats):
        import numpy as np

        rel = np.asarray(stats["rel_rnorm"])
        finite = bool(np.asarray(stats["finite"]).all())
        msg = (
            f"solve[{phase}] rel_rnorm mean={rel.mean():.3e} "
            f"max={rel.max():.3e}"
        )
        if "iters" in stats:
            it = np.asarray(stats["iters"])
            msg += f" iters mean={it.mean():.1f} max={int(it.max())}"
        if not finite:
            msg += " NON-FINITE SOLUTION"
            log.error(msg)
            if check_finite:
                raise FloatingPointError(
                    f"{phase} PDE solve produced non-finite solution"
                )
        else:
            log.info(msg)

    return fn

"""Batched dense normal-equation solver (Cholesky), TPU precision policies.

Replaces the reference dense path (qp_dual_dense_normal_kkt.py:30-43): instead
of densifying A and forming AtA with a (bs, rows, n) x (bs, n, rows) bmm, the
dense AtA is assembled directly from the static pair tables
(PDESystem.assemble_normal), then factorized with batched Cholesky.

Precision policies (config.PDEConfig.precision):
  'f64'    — factor and solve in float64 (reference semantics; emulated and
             ~50-150x slower than f32 on TPU).
  'f32_ir' — TPU-native: symmetrically Jacobi-equilibrated AtA is factored in
             float32; solutions are obtained by iterative refinement with
             float64 residuals computed matrix-free through A.  This restores
             ~float64 backward error whenever cond(equilibrated AtA) is well
             inside 1/eps_f32, at float32 factorization cost.
  'f32'    — everything float32.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from mech_nn_discovery_pde_tpu.ops.system import PDESystem
from mech_nn_discovery_pde_tpu.solvers import krylov


def _cho_solve_b(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-Cholesky solve, (bs, n, n), (bs, n) -> (bs, n)."""
    return jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]


class DenseNormalSolver:
    """LstsqInnerSolver via batched dense Cholesky of AtA."""

    def __init__(
        self,
        system: PDESystem,
        precision: str = "f64",
        ir_steps: int = 3,
        ridge: float = 0.0,
    ):
        self.system = system
        self.precision = precision
        self.ir_steps = ir_steps
        self.ridge = ridge
        self._assemble = jax.vmap(system.assemble_normal)
        self._rmatvec = jax.vmap(system.rmatvec_s)
        self._normal_mv = jax.vmap(system.normal_matvec_s)
        self._diag = jax.vmap(system.normal_diag)

    # ---- factorization ------------------------------------------------

    def factor(self, values: jnp.ndarray) -> Any:
        """Assemble and factor AtA for a batch of value vectors."""
        n = self.system.num_vars
        if self.precision in ("f32_ir", "f32"):
            # f32 target: dense A scatter (nnz-sized) + one MXU matmul is
            # ~10x faster than the pair-product scatter into AtA.  HIGHEST
            # matmul precision: the default bf16-pass decomposition loses
            # enough accuracy to make marginally-PSD AtA indefinite in f32.
            A32 = jax.vmap(self.system.assemble_dense_A)(values.astype(jnp.float32))
            ata = jnp.einsum(
                "brc,brd->bcd", A32, A32, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if self.ridge:
                ata = ata + self.ridge * jnp.eye(n, dtype=ata.dtype)
            if self.precision == "f32":
                return (jnp.linalg.cholesky(ata), None)
            # symmetric Jacobi equilibration, then float32 factorization.
            # The equilibrated matrix has unit diagonal, so a tiny ridge
            # guarantees an f32 positivity margin; iterative refinement with
            # exact f64 residuals absorbs the perturbation.
            d = jnp.diagonal(ata, axis1=-2, axis2=-1)
            s = jax.lax.rsqrt(jnp.maximum(d, jnp.finfo(ata.dtype).tiny))
            scaled = ata * s[:, :, None] * s[:, None, :]
            scaled = scaled + jnp.asarray(1e-6, scaled.dtype) * jnp.eye(
                n, dtype=scaled.dtype
            )
            L = jnp.linalg.cholesky(scaled)
            return (L, s.astype(values.dtype))
        ata = self._assemble(values)
        if self.ridge:
            ata = ata + self.ridge * jnp.eye(n, dtype=ata.dtype)
        L = jnp.linalg.cholesky(ata)
        return (L, None)

    def _solve_factored(
        self, values: jnp.ndarray, rhs_n: jnp.ndarray, factor: Any
    ) -> jnp.ndarray:
        """Solve AtA x = rhs_n given a factorization (rhs_n in normal space).

        f32_ir refines with CG preconditioned by the f32 factor rather than
        Richardson iteration: the factor-preconditioned operator has a small
        condition number, so CG converges quadratically faster per step at
        identical per-step cost (measured: plain refinement contracts the
        normal residual ~0.5x/step on the Burgers system; PCG reaches the
        same accuracy in roughly half the steps)."""
        L, s = factor
        if self.precision == "f32_ir":
            sys_ = self.system

            # fixed-step PCG, unrolled (no while_loop: a vmapped while_loop
            # inside this custom-VJP graph triggered TPU kernel faults)
            def one(vals, Li, si, b):
                def mv(x):
                    return sys_.normal_matvec_s(vals, x)

                def pc(r):
                    y = jax.scipy.linalg.cho_solve(
                        (Li, True), ((r * si).astype(jnp.float32))[..., None]
                    )[..., 0]
                    return y.astype(r.dtype) * si

                x = jnp.zeros_like(b)
                r = b
                z = pc(r)
                p = z
                rz = jnp.vdot(r, z)
                tiny = jnp.finfo(b.dtype).tiny
                # curvature guard: p^T AtA p >= 0 in exact arithmetic but can
                # round NEGATIVE for near-null p on this severely
                # ill-conditioned system (observed on TPU's emulated-f64
                # dots, Kamani bs>=256).  A max(*, tiny) guard then divides
                # by 2e-308 and produces inf -> NaN params; instead freeze
                # the update (alpha = 0) when curvature is not positive.
                for _ in range(self.ir_steps):
                    Ap = mv(p)
                    pAp = jnp.vdot(p, Ap)
                    alpha = jnp.where(pAp > tiny, rz / jnp.maximum(pAp, tiny), 0.0)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = pc(r)
                    rz_new = jnp.vdot(r, z)
                    beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
                    p = z + beta * p
                    rz = rz_new
                return x

            return jax.vmap(one)(values, L, s, rhs_n)
        return _cho_solve_b(L, rhs_n)

    # ---- LstsqInnerSolver protocol ------------------------------------

    def solve(
        self, values: jnp.ndarray, rhs: jnp.ndarray, pdata: Any = None
    ) -> Tuple[jnp.ndarray, Any]:
        factor = self.factor(values)
        atb = self._rmatvec(values, rhs)
        x = self._solve_factored(values, atb, factor)
        return x, factor

    def resolve(self, values, g, aux, backward: bool) -> jnp.ndarray:
        return self._solve_factored(values, g, aux)

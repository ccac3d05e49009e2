"""Batched Krylov solvers as compiled lax loops (TPU-native).

Replaces the reference's host-driven iterative solvers (solver/fgmres.py,
solver/cg.py): every Arnoldi/CG step there is a separate kernel launch chain
driven by Python; here whole solves compile to single XLA programs.

Key design points:
- FGMRES (right-preconditioned, flexible: stores the preconditioned basis Z,
  reference fgmres.py:141-176) runs fixed-shape restart windows inside a
  `lax.while_loop`; the small least-squares problem per window is solved with
  Givens rotations + triangular back-substitution (no LU/QR primitives, which
  have no f64 TPU lowering).
- Solvers are written per-sample and meant to be `vmap`-ed: JAX's batching
  rule for while_loop yields masked per-sample convergence automatically
  (the pattern the reference hand-codes in cg.py:69-146).
- All functions take `matvec` (and optionally `precond`) closures.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _identity(x):
    return x


def _safe_div(a, b):
    return a / jnp.where(b == 0, jnp.ones_like(b), b)


# ---------------------------------------------------------------------------
# FGMRES
# ---------------------------------------------------------------------------


class KrylovResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    rnorm: jnp.ndarray


def fgmres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    precond: Optional[Callable] = None,
    restart: int = 20,
    maxiter: int = 40,
    atol: float = 1e-5,
    tol: float = 1e-5,
    precond_matvec: Optional[Callable] = None,
) -> KrylovResult:
    """Flexible GMRES on a single right-hand side (vmap for batches).

    Convergence test matches the reference (fgmres.py:134): absolute residual
    norm <= max(atol, tol * ||b||), checked between restart windows.

    precond_matvec: optional fused v -> (z, A z) closure replacing the
    separate precond + matvec inside the Arnoldi loop (the multigrid
    preconditioner reconstructs A z from its smoother's residual invariant
    at zero extra applies — solvers/multigrid.precondition_with_Az).
    `matvec` is still used for the restart-boundary true residuals.
    """
    precond = precond or _identity
    n = b.shape[0]
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    b_norm = jnp.linalg.norm(b)
    thresh = jnp.maximum(jnp.asarray(atol, dtype), tol * b_norm)

    def restart_cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((restart + 1, n), dtype)
        Z = jnp.zeros((restart, n), dtype)
        V = V.at[0].set(_safe_div(r, beta))
        # Givens-rotation QR of the Hessenberg columns
        R = jnp.zeros((restart, restart), dtype)
        g = jnp.zeros((restart + 1,), dtype).at[0].set(beta)
        cs = jnp.zeros((restart,), dtype)
        sn = jnp.zeros((restart,), dtype)

        def arnoldi_step(j, carry):
            V, Z, R, g, cs, sn = carry
            if precond_matvec is not None:
                z, u = precond_matvec(V[j])
            else:
                z = precond(V[j])
                u = matvec(z)
            Z = Z.at[j].set(z)
            # CGS2 orthogonalization: rows > j of V are zero, so a full
            # matrix product projects exactly onto the built basis (MXU-friendly)
            h1 = V @ u
            u = u - V.T @ h1
            h2 = V @ u
            u = u - V.T @ h2
            h = h1 + h2
            hn = jnp.linalg.norm(u)
            V = V.at[j + 1].set(_safe_div(u, hn))
            # apply previous rotations to the new column h[0..j], then h[j+1]=hn
            def rot(i, hcol):
                hi, hi1 = hcol[i], hcol[i + 1]
                return hcol.at[i].set(cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1
                )
            hcol = jnp.zeros((restart + 1,), dtype)
            hcol = lax.dynamic_update_slice(hcol, h[:restart], (0,))
            hcol = hcol.at[j + 1].set(hn)
            hcol = lax.fori_loop(0, j, rot, hcol)
            # new rotation annihilating hcol[j+1]
            a_, b_ = hcol[j], hcol[j + 1]
            denom = jnp.sqrt(a_ * a_ + b_ * b_)
            c_ = _safe_div(a_, denom)
            s_ = _safe_div(b_, denom)
            c_ = jnp.where(denom == 0, jnp.ones_like(c_), c_)
            cs = cs.at[j].set(c_)
            sn = sn.at[j].set(s_)
            hcol = hcol.at[j].set(c_ * a_ + s_ * b_).at[j + 1].set(0.0)
            R = R.at[:, j].set(hcol[:restart])
            g = g.at[j + 1].set(-s_ * g[j]).at[j].set(c_ * g[j])
            return V, Z, R, g, cs, sn

        V, Z, R, g, cs, sn = lax.fori_loop(
            0, restart, arnoldi_step, (V, Z, R, g, cs, sn)
        )
        # back-substitution R y = g[:restart]
        def back(i_rev, y):
            i = restart - 1 - i_rev
            resid = g[i] - R[i] @ y
            return y.at[i].set(_safe_div(resid, R[i, i]))

        y = lax.fori_loop(0, restart, back, jnp.zeros((restart,), dtype))
        return x + Z.T @ y

    def cond(carry):
        x, it, rn = carry
        return jnp.logical_and(rn > thresh, it < maxiter)

    def body(carry):
        x, it, _ = carry
        x = restart_cycle(x)
        rn = jnp.linalg.norm(b - matvec(x))
        return x, it + restart, rn

    r0 = jnp.linalg.norm(b - matvec(x))
    x, iters, rnorm = lax.while_loop(cond, body, (x, jnp.asarray(0), r0))
    return KrylovResult(x, iters, rnorm)


def gmres(matvec, b, x0=None, *, restart=20, maxiter=40, atol=1e-5, tol=1e-5):
    """Plain restarted GMRES (unpreconditioned FGMRES)."""
    return fgmres(
        matvec, b, x0, precond=None, restart=restart, maxiter=maxiter, atol=atol, tol=tol
    )


def lgmres(
    matvec,
    b,
    x0=None,
    *,
    restart: int = 20,
    n_aug: int = 3,
    maxiter: int = 100,
    atol: float = 1e-8,
    tol: float = 1e-8,
):
    """LGMRES('loose' GMRES): restarted GMRES whose restart cycles are
    augmented with the `n_aug` most recent correction directions, recovering
    much of unrestarted-GMRES convergence at restarted cost (reference
    cg.py:350 keeps an lgmres variant among its alternates).

    Implemented by warm-starting each cycle with a minimal-residual update
    over the stored corrections, then running an FGMRES cycle."""
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    dtype = b.dtype
    b_norm = jnp.linalg.norm(b)
    thresh = jnp.maximum(jnp.asarray(atol, dtype), tol * b_norm)

    Z = jnp.zeros((n_aug, n), dtype)  # past corrections

    def body(carry):
        x, Z, it, _ = carry
        r = b - matvec(x)
        # minimal-residual projection over the stored corrections
        AZ = jax.vmap(matvec)(Z)  # (n_aug, n)
        G = AZ @ AZ.T + jnp.eye(n_aug, dtype=dtype) * jnp.finfo(dtype).eps
        # tiny SPD solve via Cholesky (f64 LU has no TPU lowering)
        Lg = jnp.linalg.cholesky(G)
        y = jax.scipy.linalg.cho_solve((Lg, True), (AZ @ r)[:, None])[:, 0]
        dx_aug = Z.T @ y
        x = x + dx_aug
        res = fgmres(
            matvec, b, x, restart=restart, maxiter=restart, atol=0.0, tol=0.0
        )
        dx = res.x - x
        nrm = jnp.maximum(jnp.linalg.norm(dx), jnp.finfo(dtype).tiny)
        Z = jnp.concatenate([(dx / nrm)[None], Z[:-1]], axis=0)
        x = res.x
        rn = jnp.linalg.norm(b - matvec(x))
        return x, Z, it + restart, rn

    def cond(carry):
        _, _, it, rn = carry
        return jnp.logical_and(rn > thresh, it < maxiter)

    r0 = jnp.linalg.norm(b - matvec(x))
    x, Z, iters, rnorm = lax.while_loop(cond, body, (x, Z, jnp.asarray(0), r0))
    return KrylovResult(x, iters, rnorm)


# ---------------------------------------------------------------------------
# CG / MINRES
# ---------------------------------------------------------------------------


def cg(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    precond: Optional[Callable] = None,
    maxiter: int = 100,
    tol: float = 1e-6,
    atol: float = 0.0,
) -> KrylovResult:
    """Preconditioned conjugate gradients on an SPD operator (per-sample;
    vmap gives the masked batched behavior of reference cg.py:51-147)."""
    precond = precond or _identity
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    thresh = jnp.maximum(jnp.asarray(atol, b.dtype), tol * jnp.linalg.norm(b))

    def cond(c):
        x, r, z, p, rz, it = c
        return jnp.logical_and(jnp.linalg.norm(r) > thresh, it < maxiter)

    def body(c):
        x, r, z, p, rz, it = c
        Ap = matvec(p)
        # curvature guard: on near-singular SPD systems p^T A p can round
        # <= 0 for near-null p (observed on TPU emulated-f64 dots); freeze
        # the update instead of dividing by ~0 (see solvers/cholesky.py)
        pAp = jnp.vdot(p, Ap)
        tiny = jnp.finfo(b.dtype).tiny
        alpha = jnp.where(pAp > tiny, rz / jnp.maximum(pAp, tiny), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, r, z, p, rz, it = lax.while_loop(cond, body, (x, r, z, p, rz, jnp.asarray(0)))
    return KrylovResult(x, it, jnp.linalg.norm(r))


def minres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    maxiter: int = 200,
    tol: float = 1e-6,
    atol: float = 0.0,
) -> KrylovResult:
    """MINRES for symmetric (possibly indefinite) systems (reference
    cg.py:1075-1405, batched via vmap instead of explicit masks)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    dtype = b.dtype
    r1 = b - matvec(x)
    beta = jnp.linalg.norm(r1)
    thresh = jnp.maximum(jnp.asarray(atol, dtype), tol * jnp.maximum(beta, 1e-30))

    # Lanczos + implicit QR (standard MINRES recurrences)
    state = dict(
        x=x,
        r1=jnp.zeros_like(b),
        r2=r1,
        w0=jnp.zeros_like(b),
        w1=jnp.zeros_like(b),
        beta=beta,
        beta_prev=jnp.asarray(0.0, dtype),
        phibar=beta,
        cs=jnp.asarray(-1.0, dtype),
        sn=jnp.asarray(0.0, dtype),
        dbar=jnp.asarray(0.0, dtype),
        eps=jnp.asarray(0.0, dtype),
        it=jnp.asarray(0),
    )

    def cond(s):
        return jnp.logical_and(jnp.abs(s["phibar"]) > thresh, s["it"] < maxiter)

    def body(s):
        v = _safe_div(s["r2"], s["beta"])
        y = matvec(v)
        y = jnp.where(s["it"] > 0, y - _safe_div(s["beta"], s["beta_prev"]) * s["r1"], y)
        alfa = jnp.vdot(v, y)
        y = y - _safe_div(alfa, s["beta"]) * s["r2"]
        r1n, r2n = s["r2"], y
        beta_new = jnp.linalg.norm(y)

        dbar, eps_old = s["dbar"], s["eps"]
        oldb = s["beta"]
        delta = s["cs"] * dbar + s["sn"] * alfa
        gbar = s["sn"] * dbar - s["cs"] * alfa
        eps_new = s["sn"] * beta_new
        dbar_new = -s["cs"] * beta_new
        gamma = jnp.sqrt(gbar * gbar + beta_new * beta_new)
        gamma = jnp.maximum(gamma, jnp.asarray(1e-30, dtype))
        cs_new = gbar / gamma
        sn_new = beta_new / gamma
        phi = cs_new * s["phibar"]
        phibar_new = sn_new * s["phibar"]

        w = _safe_div(v - eps_old * s["w0"] - delta * s["w1"], gamma)
        xn = s["x"] + phi * w
        return dict(
            x=xn,
            r1=r1n,
            r2=r2n,
            w0=s["w1"],
            w1=w,
            beta=beta_new,
            beta_prev=oldb,
            phibar=phibar_new,
            cs=cs_new,
            sn=sn_new,
            dbar=dbar_new,
            eps=eps_new,
            it=s["it"] + 1,
        )

    s = lax.while_loop(cond, body, state)
    return KrylovResult(s["x"], s["it"], jnp.abs(s["phibar"]))


def cg_normal(system_matvec, system_rmatvec, b, **kw):
    """CG on the normal equations expressed as a matvec chain AtA x
    (reference cg_matvec, cg.py:51-147)."""
    return cg(lambda x: system_rmatvec(system_matvec(x)), b, **kw)


def cg_block(
    matvec_b: Callable,
    b: jnp.ndarray,
    *,
    tol: float = 1e-12,
    maxiter: int = 100,
    atol: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched CG with per-sample continue masks (reference cg_block,
    cg.py:841-953): all samples march through the full fixed loop, converged
    or degenerate samples frozen by a 0/1 mask — the reference's explicit
    block formulation of what vmap(cg) provides implicitly.  Kept for
    inventory parity; identical update algebra including the nan-guarded
    alpha/beta (which our curvature guard subsumes).

    matvec_b: batched SPD operator (bs, n) -> (bs, n).
    Returns (x, resid) with resid the final per-sample residual norms.
    """
    b_norm = jnp.linalg.norm(b, axis=-1)
    cont = (b_norm > 1e-9).astype(b.dtype)
    athr = tol * b_norm if atol is None else jnp.maximum(
        jnp.asarray(atol, b.dtype), tol * b_norm
    )

    x = jnp.zeros_like(b)
    r = b - matvec_b(x)
    tiny = jnp.finfo(b.dtype).tiny

    def body(i, c):
        x, r, p, rho, cont = c
        z = r  # unpreconditioned, as in the reference
        rho_new = jnp.sum(r * z, axis=1)
        beta = jnp.where(rho > tiny, rho_new / jnp.maximum(rho, tiny), 0.0)
        p = jnp.where(i == 0, z, z + beta[:, None] * p)
        q = matvec_b(p)
        pq = jnp.sum(p * q, axis=1)
        alpha = jnp.where(pq > tiny, rho_new / jnp.maximum(pq, tiny), 0.0)
        alpha = alpha * cont
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * q
        resid = jnp.linalg.norm(r, axis=1)
        cont = cont * (resid > athr).astype(b.dtype)
        return x, r, p, rho_new, cont

    x, r, _, _, _ = lax.fori_loop(
        0, maxiter, body, (x, r, jnp.zeros_like(b), jnp.zeros_like(b_norm), cont)
    )
    return x, jnp.linalg.norm(r, axis=1)

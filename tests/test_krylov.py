"""Krylov solver unit tests on manufactured SPD / symmetric systems."""

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.solvers import krylov


def make_spd(n, cond=100.0, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, np.log10(cond), n)
    return Q @ np.diag(eigs) @ Q.T


def test_fgmres_unpreconditioned():
    n = 50
    A = jnp.asarray(make_spd(n, cond=50))
    x_true = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    b = A @ x_true
    res = krylov.fgmres(lambda v: A @ v, b, restart=20, maxiter=200, tol=1e-10, atol=1e-10)
    assert float(jnp.linalg.norm(res.x - x_true)) < 1e-6


def test_fgmres_preconditioned_fewer_iters():
    n = 80
    A_np = make_spd(n, cond=1e4, seed=2)
    A = jnp.asarray(A_np)
    Minv = jnp.asarray(np.linalg.inv(A_np + 0.1 * np.eye(n)))
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    plain = krylov.fgmres(lambda v: A @ v, b, restart=10, maxiter=200, tol=1e-8, atol=1e-8)
    prec = krylov.fgmres(
        lambda v: A @ v, b, precond=lambda v: Minv @ v,
        restart=10, maxiter=200, tol=1e-8, atol=1e-8,
    )
    assert float(prec.rnorm) <= 1e-8 * float(jnp.linalg.norm(b)) + 1e-8
    assert int(prec.iters) < int(plain.iters)


def test_fgmres_vmap_masked_convergence():
    """vmapped FGMRES converges each sample of a batch with different
    conditioning (the masked-convergence behavior)."""
    n, bs = 40, 3
    mats = np.stack([make_spd(n, cond=10.0 ** (k + 1), seed=k) for k in range(bs)])
    A = jnp.asarray(mats)
    b = jnp.asarray(np.random.default_rng(5).standard_normal((bs, n)))

    def solve_one(Ai, bi):
        return krylov.fgmres(lambda v: Ai @ v, bi, restart=15, maxiter=1500,
                             tol=1e-9, atol=1e-9).x

    x = jax.vmap(solve_one)(A, b)
    resid = np.linalg.norm(np.asarray(jnp.einsum("bij,bj->bi", A, x) - b), axis=1)
    assert (resid < 1e-6).all()


def test_cg_spd():
    n = 60
    A = jnp.asarray(make_spd(n, cond=100, seed=7))
    x_true = jnp.asarray(np.random.default_rng(8).standard_normal(n))
    b = A @ x_true
    res = krylov.cg(lambda v: A @ v, b, maxiter=500, tol=1e-12)
    assert float(jnp.linalg.norm(res.x - x_true)) / float(jnp.linalg.norm(x_true)) < 1e-8


def test_cg_preconditioned():
    n = 60
    A_np = make_spd(n, cond=1e5, seed=9)
    A = jnp.asarray(A_np)
    d = jnp.asarray(1.0 / np.diag(A_np))
    b = jnp.asarray(np.random.default_rng(10).standard_normal(n))
    res = krylov.cg(lambda v: A @ v, b, precond=lambda r: d * r, maxiter=2000, tol=1e-10)
    assert float(res.rnorm) < 1e-9 * float(jnp.linalg.norm(b)) + 1e-9


def test_minres_symmetric_indefinite():
    n = 50
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.concatenate([np.linspace(1, 10, n // 2), -np.linspace(1, 5, n - n // 2)])
    A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    res = krylov.minres(lambda v: A @ v, b, maxiter=500, tol=1e-10)
    assert float(jnp.linalg.norm(res.x - x_true)) < 1e-6


def test_gmres_nonsymmetric():
    n = 40
    rng = np.random.default_rng(12)
    A = jnp.asarray(np.eye(n) * 5 + 0.5 * rng.standard_normal((n, n)))
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    res = krylov.gmres(lambda v: A @ v, b, restart=20, maxiter=400, tol=1e-10, atol=1e-10)
    assert float(jnp.linalg.norm(res.x - x_true)) < 1e-6


def test_cg_normal():
    rng = np.random.default_rng(13)
    A = jnp.asarray(rng.standard_normal((30, 20)))
    x_true = jnp.asarray(rng.standard_normal(20))
    b = A.T @ (A @ x_true)
    res = krylov.cg_normal(lambda v: A @ v, lambda y: A.T @ y, b, maxiter=500, tol=1e-12)
    assert float(jnp.linalg.norm(res.x - x_true)) < 1e-5


def test_cg_block_matches_vmapped_cg():
    """cg_block (reference cg.py:841-953 masked batched CG) solves a batch
    of small SPD systems to the same solutions as vmap(cg), including a
    zero-rhs sample (frozen by the continue mask)."""
    from mech_nn_discovery_pde_tpu.solvers.krylov import cg, cg_block

    rng = np.random.default_rng(0)
    bs, n = 4, 24
    Ms = rng.standard_normal((bs, n, n))
    As = jnp.asarray(np.einsum("bij,bkj->bik", Ms, Ms) + 10 * np.eye(n))
    b = jnp.asarray(rng.standard_normal((bs, n)))
    b = b.at[2].set(0.0)  # exercise the zero-rhs mask path

    matvec_b = lambda x: jnp.einsum("bij,bj->bi", As, x)
    x, resid = jax.jit(
        lambda b: cg_block(matvec_b, b, tol=1e-12, maxiter=200)
    )(b)
    want = jax.vmap(
        lambda A, bi: cg(lambda v: A @ v, bi, tol=1e-12, maxiter=200).x
    )(As, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                               rtol=1e-8, atol=1e-8)
    assert float(resid[2]) < 1e-12
    assert bool((np.asarray(resid)[[0, 1, 3]] < 1e-8).all())

"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops import pallas_kernels as pk


def make_blocks(N, n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((N, n, n))
    return jnp.asarray(np.einsum("bij,bkj->bik", M, M) + n * np.eye(n))


def test_block_cholesky_interpret():
    B = make_blocks(4, 56).astype(jnp.float32)
    L = pk.block_cholesky(B, interpret=True)
    expect = np.linalg.cholesky(np.asarray(B, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(L), expect, rtol=2e-4, atol=2e-4)


def test_block_cho_solve_interpret():
    N, n = 3, 40
    B = make_blocks(N, n, seed=1).astype(jnp.float32)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((N, n)).astype(np.float32))
    L = pk.block_cholesky(B, interpret=True)
    x = pk.block_cho_solve(L, b, interpret=True)
    expect = np.linalg.solve(
        np.asarray(B, dtype=np.float64), np.asarray(b)[..., None]
    )[..., 0]
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-3, atol=1e-3)

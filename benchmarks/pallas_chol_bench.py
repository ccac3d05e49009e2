import sys; sys.path.insert(0, ".")  # noqa: E402
"""Pallas many-small-block Cholesky+inverse vs XLA batched equivalents, on
the smoother's real workload shape: the line-block smoother factors
n_blocks=(32*32*32)=32768 SPD blocks of size (8*7)=56 (GL fine level,
batched) once per hierarchy build, producing explicit inverses applied by
matmul.  VERDICT round 1 #5: wire the Pallas kernels or delete them — keep
the winner."""

import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=5):
    o = f(0, *args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for k in range(n):
        o = f(k, *args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def main():
    from mech_nn_discovery_pde_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    for n_blocks, bw in [(32768, 56), (8192, 56), (32768, 21)]:
        A = rng.standard_normal((n_blocks, bw, bw)).astype(np.float32)
        B = jnp.asarray(np.einsum("nij,nkj->nik", A, A) + 0.1 * np.eye(bw, dtype=np.float32))

        def xla_inv(k, B):
            Bk = B + 1e-3 * k
            L = jnp.linalg.cholesky(Bk)
            eye = jnp.broadcast_to(jnp.eye(bw, dtype=B.dtype), Bk.shape)
            return jax.scipy.linalg.cho_solve((L, True), eye)

        f = jax.jit(xla_inv)
        t_xla = timeit(f, B)

        def pallas_inv(k, B):
            Bk = B + 1e-3 * k
            L = pk.block_cholesky(Bk)
            eye = jnp.broadcast_to(jnp.eye(bw, dtype=B.dtype), Bk.shape)
            return pk.block_cho_solve(L, eye)

        try:
            f = jax.jit(pallas_inv)
            t_pal = timeit(f, B)
        except Exception as e:
            t_pal = float("nan")
            print("pallas failed:", type(e).__name__, str(e)[:200])

        print(
            f"blocks={n_blocks} bw={bw}: XLA chol+inv {t_xla*1e3:.2f} ms, "
            f"Pallas {t_pal*1e3:.2f} ms, ratio {t_xla/t_pal:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()

import sys; sys.path.insert(0, ".")  # noqa: E402
"""Benchmark matvec implementations (COO segment-sum vs ELL gathers vs
structured shifts) on GL-sized systems; run on the TPU."""

import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.ops.structured import make_structured_ops, split_values
from mech_nn_discovery_pde_tpu.ops.system import PDESystem


def timeit(f, *args, n=20):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def main():
    for dims in [(32, 32), (8, 32, 32)]:
        ivs = [lambda *d: (0, 0, [0] * len(d), [x - 1 for x in d])]
        sys = PDESystem.build(dims, init_index_mi_list=ivs)
        rng = np.random.default_rng(0)
        bs = 32
        for dtype in (jnp.float32, jnp.float64):
            vals = jnp.asarray(rng.standard_normal((bs, sys.n_entries)), dtype=dtype)
            x = jnp.asarray(rng.standard_normal((bs, sys.num_vars)), dtype=dtype)

            # repeated normal matvec (the Krylov-loop shape): 20 applications
            def many(f, v, x0):
                def body(i, x):
                    return f(v, x) * 0.5 + x0
                return jax.lax.fori_loop(0, 20, body, x0)

            coo = jax.jit(jax.vmap(lambda v, x0: many(
                lambda vv, xx: sys.rmatvec_coo(vv, sys.matvec_coo(vv, xx)), v, x0)))
            t_coo = timeit(coo, vals, x)

            def ell_many(v, x0):
                p = sys.pack_values(v)
                return many(lambda _, xx: sys.normal_matvec_packed(p, xx), v, x0)

            ell = jax.jit(jax.vmap(ell_many))
            t_ell = timeit(ell, vals, x)

            mv, rmv = make_structured_ops(sys.spec, dtype)

            def st_many(v, x0):
                sv = split_values(sys.spec, v)
                return many(lambda _, xx: rmv(sv, mv(sv, xx)), v, x0)

            st = jax.jit(jax.vmap(st_many))
            t_st = timeit(st, vals, x)
            print(
                f"dims={dims} {dtype.__name__}: 20x normal matvec bs{bs}: "
                f"coo {t_coo*1e3:.1f} ms | ell {t_ell*1e3:.1f} ms | "
                f"structured {t_st*1e3:.1f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()

import sys; sys.path.insert(0, ".")  # noqa: E402
"""Stencil-AtA apply: XLA flat-shift chain vs Pallas whole-sample-in-VMEM
kernel, on the GL fine level ((8,32,32), n_mi=7, bs=32, f32).

Bandwidth bound: coef (32 x 109 x 8192 x 4B = 114 MB) + x/y (2 x 7.3 MB)
~= 130 MB per batched apply -> ~0.16 ms at 800 GB/s."""

import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=10):
    o = f(0, *args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for k in range(n):
        o = f(k, *args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def main():
    from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
        build_normal_coef,
        make_desc,
        normal_stencil_matvec,
        normal_stencil_matvec_pallas,
    )
    from mech_nn_discovery_pde_tpu.ops.structured import split_values
    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    dims, bs = (8, 32, 32), 32
    ivs = [lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1])]
    sysm = PDESystem.build(dims, order=2, init_index_mi_list=ivs, n_iv=1)
    desc = make_desc(sysm.spec)
    rng = np.random.default_rng(0)
    values = jnp.asarray(
        rng.standard_normal((bs, sysm.n_entries)).astype(np.float32)
    )
    x = jnp.asarray(rng.standard_normal((bs, sysm.num_vars)).astype(np.float32))

    build = jax.jit(
        jax.vmap(lambda v: build_normal_coef(sysm.spec, desc, split_values(sysm.spec, v)))
    )
    coef = build(values)
    print("coef", coef.shape, coef.dtype, f"{coef.size * 4 / 1e6:.0f} MB", flush=True)

    # bandwidth yardstick: one full read of coef (114 MB).  Any measurement
    # implying >800 GB/s is a tunnel/measurement artifact, not compute.
    f = jax.jit(lambda k, c: jnp.sum(c * (1.0 + 0.001 * k)))
    t = timeit(f, coef)
    print(f"sum(coef) read yardstick {t*1e3:7.3f} ms "
          f"({coef.size * 4 / t / 1e9:.0f} GB/s)", flush=True)

    # 20 reads chained: defeats any per-call pipelining
    def sum20(k, c):
        def body(i, acc):
            return acc + jnp.sum(c * (1.0 + 0.001 * (acc + k)))
        return jax.lax.fori_loop(0, 20, body, 0.0 * k)

    f = jax.jit(sum20)
    t = timeit(f, coef)
    print(f"20x sum(coef) chain     {t*1e3:7.2f} ms "
          f"({20 * coef.size * 4 / t / 1e9:.0f} GB/s)", flush=True)

    from mech_nn_discovery_pde_tpu.ops.normal_stencil import (
        normal_stencil_matvec_padded,
    )

    def chain20(apply_fn):
        def run(k, c, x):
            def one(ci, xi):
                def body(i, xi):
                    return apply_fn(desc, ci, xi) * 0.5 + xi
                return jax.lax.fori_loop(0, 20, body, xi)
            return jax.vmap(one)(c, x + 1e-3 * k)
        return run

    f = jax.jit(chain20(normal_stencil_matvec))
    t = timeit(f, coef, x)
    print(f"20x XLA rolled apply   {t*1e3:9.2f} ms  ({t/20*1e3:7.3f} ms/apply)", flush=True)

    fp = jax.jit(chain20(normal_stencil_matvec_padded))
    tp = timeit(fp, coef, x)
    print(f"20x XLA padded apply   {tp*1e3:9.2f} ms  ({tp/20*1e3:7.3f} ms/apply)", flush=True)
    yr = jax.jit(jax.vmap(lambda c, xi: normal_stencil_matvec(desc, c, xi)))(coef, x)
    yp = jax.jit(jax.vmap(lambda c, xi: normal_stencil_matvec_padded(desc, c, xi)))(coef, x)
    print(f"rolled vs padded rel err {float(jnp.abs(yr-yp).max()/jnp.abs(yp).max()):.2e}", flush=True)

    def pal20(k, c, x):
        def one(ci, xi):
            def body(i, xi):
                return normal_stencil_matvec_pallas(desc, ci, xi) * 0.5 + xi
            return jax.lax.fori_loop(0, 20, body, xi)
        return jax.vmap(one)(c, x + 1e-3 * k)

    try:
        f = jax.jit(pal20)
        t = timeit(f, coef, x)
        print(f"20x Pallas stencil apply {t*1e3:7.2f} ms  ({t/20*1e3:7.3f} ms/apply)", flush=True)
    except Exception as e:
        print("pallas failed:", type(e).__name__, str(e)[:400], flush=True)

    # correctness on-device
    y1 = jax.jit(jax.vmap(lambda c, xi: normal_stencil_matvec(desc, c, xi)))(coef, x)
    try:
        y2 = jax.jit(jax.vmap(lambda c, xi: normal_stencil_matvec_pallas(desc, c, xi)))(coef, x)
        err = float(jnp.abs(y1 - y2).max() / jnp.abs(y1).max())
        print(f"pallas vs xla rel err {err:.2e}", flush=True)
    except Exception as e:
        print("pallas check failed:", type(e).__name__, str(e)[:400], flush=True)


if __name__ == "__main__":
    main()

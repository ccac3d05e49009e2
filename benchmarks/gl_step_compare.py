import sys; sys.path.insert(0, ".")  # noqa: E402
"""End-to-end GL training-step time: mg_normal_op 'stencil' vs 'factored'.

Microbenchmarks through the axon tunnel are untrustworthy (a sum-of-114MB
yardstick 'measured' 16 TB/s), so the operator decision is made on the full
jitted fwd+bwd GL step with f64-perturbed inputs (distinct per call)."""

import os
import time

import jax

jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer


def build_step(variant):
    # variant = mg_normal_op, optionally suffixed '_bf16' (mg_precond_dtype
    # ='bf16', half-traffic stored preconditioner) and/or '_fused'
    # (mg_smoother='chebyshev_fused', VMEM-resident Pallas smoothing pass)
    pdt = "bf16" if "_bf16" in variant else "f32"
    smoother = "chebyshev_fused" if "_fused" in variant else "chebyshev"
    op = variant.replace("_bf16", "").replace("_fused", "")
    bs, dims, ng = 32, (8, 32, 32), 3
    ivs = [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
        lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
    ]
    layer = MultigridLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=ivs, solver_dbl=True, n_grid=ng,
        downsample_first=False,
        config=PDEConfig(precision="f32_ir", mg_solve_dtype="f32",
                         mg_normal_op=op, mg_precond_dtype=pdt,
                         mg_smoother=smoother),
    )
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 0] = -1.0
    coeffs[..., 1] = 1.0
    coeffs[..., 5] = -1.0
    coeffs[..., 6] = -1.0
    rhs = 0.01 * rng.standard_normal((bs, layer.grid_size))
    iv = 0.1 * rng.standard_normal((bs, layer.system.n_init_rows))
    steps = [jnp.asarray(np.full((bs, d - 1), 0.1)) for d in dims]
    c0, r0, i0 = (jnp.asarray(a) for a in (coeffs, rhs, iv))

    def fwd_bwd(c, r, i):
        def loss(c, r, i):
            u0, _, _ = layer(c, r, i, steps)
            return jnp.sum(u0**2)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(c, r, i)

    return jax.jit(fwd_bwd), (c0, r0, i0)


def main():
    for op in (sys.argv[1:] or ["stencil", "factored"]):
        step, (c0, r0, i0) = build_step(op)
        t0 = time.perf_counter()
        out = step(c0, r0, i0)
        jax.block_until_ready(out)
        t_first = time.perf_counter() - t0
        n = 3
        t0 = time.perf_counter()
        for k in range(1, n + 1):
            out = step(c0 + 1e-9 * k, r0 + 1e-9 * k, i0)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{op}: step {dt:.2f} s (first incl compile {t_first:.1f} s)",
              flush=True)


if __name__ == "__main__":
    main()

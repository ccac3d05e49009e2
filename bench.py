"""Headline benchmark: the flagship Ginzburg-Landau multigrid training step.

Measures the full training-relevant iteration of the reference's GL sparse
workload (solver_dim (8, 32, 32), n_grid 3, bs 32 -> 1.83M unknowns per
batch; discovery/ginzburg_landau.py:52-57): constraint fill, coarse-hierarchy
build, FGMRES(10x40)+V-cycle forward solve, and the IFT backward solve at the
reference's separate backward budget — i.e. KKT solves/sec through the
MultigridLayer.  Also measures the dense Burgers path (round-1 headline) and
reports it under "extras".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

vs_baseline (documented model, the repo publishes no numbers —
BASELINE.json published:{}): the reference's GL step on A100 runs 40 forward
+ 40 backward FGMRES iterations, each applying one V-cycle with 5+5
Gauss-Seidel sweeps per level via CuPy CSR spsolve_triangular
(solver/multigrid.py:399-498, config.py:14-24).  AtA for this system has
~19M nonzeros batch-wide across ~1.3x level overhead; a GS sweep is one
lower+upper triangular solve = ~2 passes over nnz (~460 MB).  The cost is
dominated by the level-scheduled sparse triangular solves, whose achieved
bandwidth on unstructured CSR spans roughly 100% (impossible best case:
0.5 s/step = 64 solves/s) down to ~3% (wavefront-bound worst case:
~17 s/step = 1.9 solves/s), plus ~1000 host-driven kernel launches per
step.  The denominator is the geometric midpoint of that band,
8 s/step -> 4.0 KKT solves/sec, with the full range [1.9, 64] documented
here; vs_baseline therefore carries a ~4x model uncertainty in either
direction and should be read together with extras.gl_step_seconds.
"""

import json
import os
import time


def _bench_gl(jax, jnp, np):
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer

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
        config=PDEConfig(precision="f32_ir", mg_solve_dtype="f32"),
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

    step = jax.jit(fwd_bwd)
    out = step(c0, r0, i0)
    jax.block_until_ready(out)
    n = 3
    t0 = time.perf_counter()
    for k in range(n):
        out = step(c0 + 1e-12 * k, r0, i0)  # vary inputs: defeat result cache
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return bs / dt, dt


def _bench_dense(jax, jnp, np):
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    bs, dims = 10, (32, 32)
    iv_list = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
        lambda nx, ny: (1, 0, [0, ny - 1], [nx - 1, ny - 1]),
    ]
    layer = PDEDenseLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, solver_dbl=True,
        config=PDEConfig(precision="f32_ir"),
    )
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 0.5
    coeffs[..., 4] = 0.1
    rhs = 0.01 * rng.standard_normal((bs, layer.grid_size))
    iv = 0.1 * rng.standard_normal((bs, 31 + 31 + 32))
    steps = [
        jnp.asarray(np.full((bs, 31), 0.025)),
        jnp.asarray(np.full((bs, 31), 0.078)),
    ]
    c0, r0, i0 = (jnp.asarray(a) for a in (coeffs, rhs, iv))

    def fwd_bwd(c, r, i):
        def loss(c, r, i):
            u0, u, _ = layer(c, r, i, steps)
            return jnp.sum(u0**2)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(c, r, i)

    step = jax.jit(fwd_bwd)
    out = step(c0, r0, i0)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for k in range(n):
        out = step(c0 + 1e-12 * k, r0, i0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return bs / dt


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: the GL fwd+bwd graph takes minutes to compile
    # through the TPU tunnel; cache serialized executables across runs
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    gl_solves_per_sec, gl_step = _bench_gl(jax, jnp, np)
    dense_solves_per_sec = _bench_dense(jax, jnp, np)

    gl_baseline = 4.0  # midpoint A100 CuPy model (range [1.9, 64]), see docstring
    dense_baseline = 18.0  # A100 f64 flop model (round-1 docstring)
    print(
        json.dumps(
            {
                "metric": "gl_multigrid_kkt_fwd_bwd_solves_per_sec",
                "value": round(gl_solves_per_sec, 2),
                "unit": "KKT solves/sec (bs=32, (8,32,32) n_grid=3, 1.83M vars, fwd+IFT bwd)",
                "vs_baseline": round(gl_solves_per_sec / gl_baseline, 3),
                "extras": {
                    "gl_step_seconds": round(gl_step, 3),
                    "burgers_dense_kkt_fwd_bwd_solves_per_sec": round(
                        dense_solves_per_sec, 2
                    ),
                    "burgers_dense_vs_baseline": round(
                        dense_solves_per_sec / dense_baseline, 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

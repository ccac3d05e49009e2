import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402
"""Smoother-budget quality battery on the GL bench problem (TPU, forward
solve only): round-5 follow-up to the cheb3 decomp finding that the
Chebyshev smoother is ~90% of the production step (b30rm 7.70 s vs
b30rm_cheb3 4.22 s same-session).  Cheaper smoothing wins big IF the
preconditioned FGMRES still beats the reference's own quality bar — the
faithful GS 5+5 V-cycle replication reaches relres 3.1e-3 @40 iterations
on the GL-shaped system (benchmarks/ref_gs_replication.py, VALIDATION).

Prints forward-solve rel_rnorm for each (pre,post,iters) candidate.

Usage: python benchmarks/smoother_budget_tpu.py [pre:post:iters ...]
Default battery: 3:3:40 4:4:40 5:5:30 5:5:40 7:7:30
"""

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


def build(pre, post, iters):
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
        config=PDEConfig(
            precision="f32_ir", mg_solve_dtype="f32",
            mg_smoother_steps_pre=pre, mg_smoother_steps_post=post,
            mg_fgmres_max_iter_forward=iters,
            mg_smoother_residual=True, mg_fused_matvec=True,
        ),
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
    return layer, (c0, r0, i0, steps)


def main():
    cands = sys.argv[1:] or ["3:3:40", "4:4:40", "5:5:30", "5:5:40", "7:7:30"]
    for cand in cands:
        pre, post, iters = (int(x) for x in cand.split(":"))
        try:
            layer, (c0, r0, i0, steps) = build(pre, post, iters)
            stats = jax.jit(lambda c, r, i: layer.solve_stats(c, r, i, steps))
            t0 = time.perf_counter()
            out = stats(c0, r0, i0)
            rel = np.asarray(out["rel_rnorm"])
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = stats(c0 + 1e-6, r0, i0)
            rel = np.asarray(out["rel_rnorm"])
            dt = time.perf_counter() - t0
            print(f"cheb{pre}+{post}@{iters}: rel_rnorm {rel.max():.3e} "
                  f"(solve {dt:.2f} s, first {t_first:.1f} s)", flush=True)
        except Exception as e:
            print(f"{cand}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

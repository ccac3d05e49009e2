"""Headline benchmark: batched KKT solves/sec on the Burgers dense workload.

Measures a full training-relevant iteration — constraint fill, AtA assembly,
batched Cholesky (f32 + f64-residual iterative refinement), solve, and the
IFT backward pass — on the reference's Burgers discovery configuration
(solver_dim (32, 32), bs 10, 5120 unknowns / ~9.1k constraint rows per
sample; discovery/burgers_dparam_viscous.py:55-57).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference implementation on A100 (its published hardware)
spends, per batch, ~2.4e12 flops in the dense AtA bmm + ~4.5e11 in f64
batched Cholesky + a comparable backward (qp_dual_dense_normal_kkt.py:30-40),
i.e. >= ~0.5 s/iteration at realistic cuBLAS/cuSOLVER f64 throughput ->
~18 KKT solves/sec.  vs_baseline = measured / 18.0.  (The repo publishes no
numbers — BASELINE.json published:{} — so the denominator is this documented
flop-model estimate.)
"""

import json
import sys
import time


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

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

        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(c, r, i)
        return l, g

    step = jax.jit(fwd_bwd)
    out = step(c0, r0, i0)
    jax.block_until_ready(out)

    n = 20
    t0 = time.perf_counter()
    for k in range(n):
        out = step(c0 + 1e-12 * k, r0, i0)  # vary inputs: defeat result caching
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    solves_per_sec = bs / dt

    baseline = 18.0  # reference A100 f64 estimate, see module docstring
    print(
        json.dumps(
            {
                "metric": "burgers_dense_kkt_fwd_bwd_solves_per_sec",
                "value": round(solves_per_sec, 2),
                "unit": "KKT solves/sec (bs=10, 5120 vars, fwd+IFT bwd)",
                "vs_baseline": round(solves_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

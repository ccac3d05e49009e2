import sys; sys.path.insert(0, ".")  # noqa: E402
"""Decompose GL multigrid solve cost on TPU: matvec / block apply /
transfers / coarse solve / full V-cycle / hierarchy build."""

import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer


def timeit(f, *args, n=5):
    o = f(0, *args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for k in range(n):
        o = f(k, *args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def main():
    bs, dims, ng = 32, (8, 32, 32), 3
    ivs = [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
        lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
    ]
    layer = MultigridLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                           init_index_mi_list=ivs, solver_dbl=True, n_grid=ng,
                           downsample_first=False, config=PDEConfig())
    mgs = layer.mg_solver
    sys0 = mgs.systems[0]
    rng = np.random.default_rng(0)
    coeffs = jnp.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs = coeffs.at[..., 1].set(1.0).at[..., 5].set(-0.1).at[..., 6].set(-0.1)
    rhs = jnp.zeros((bs, layer.grid_size))
    iv = jnp.asarray(0.1 * rng.standard_normal((bs, sys0.n_init_rows)))
    steps = [jnp.asarray(np.full((bs, d - 1), 0.1)) for d in dims]
    values = sys0.fill_values(coeffs, steps, dtype=jnp.float64)
    rhs_vec = sys0.fill_rhs(rhs, iv, dtype=jnp.float64)

    build = jax.jit(lambda k: mgs.build_hierarchy(coeffs + 1e-12 * k, rhs, iv, steps, values))
    print("hierarchy build   %.3f s" % timeit(build), flush=True)
    hier = build(0)

    x0 = jnp.asarray(rng.standard_normal((bs, sys0.num_vars)))
    x32 = x0.astype(jnp.float32)

    smv, srmv = mgs._sops32[0]

    def mv20(k, h):
        def one(sv, x):
            def body(i, x):
                return srmv(sv, smv(sv, x)) * 0.5 + x32[0] * 0.0 + x
            return jax.lax.fori_loop(0, 20, body, x)
        return jax.vmap(one)(h["levels"][0]["sv"], x32 + 1e-3 * k)

    f = jax.jit(mv20)
    print("20x f32 normal mv %.3f s" % timeit(f, hier), flush=True)

    def blk20(k, h):
        def one(bc, x):
            def body(i, x):
                return mgs._block_apply(sys0, bc, x) * 0.5 + x
            return jax.lax.fori_loop(0, 20, body, x)
        return jax.vmap(one)(h["levels"][0]["binv"], x32 + 1e-3 * k)

    f = jax.jit(blk20)
    print("20x block apply   %.3f s" % timeit(f, hier), flush=True)

    def smooth10(k, h):
        def one(hs, x):
            lvl = jax.tree.map(lambda a: a, {kk: vv for kk, vv in hs.items()})
            return mgs._smooth(0, hs, x * 0.0, x, 10, False)
        return jax.vmap(lambda hs, x: mgs._smooth(0, hs, x * 0.0, x, 10, False),
                        in_axes=(0, 0))(
            jax.tree.map(lambda a: a, h["levels"][0]), x32 + 1e-3 * k)

    f = jax.jit(smooth10)
    print("10-step smoother  %.3f s" % timeit(f, hier), flush=True)

    def vc(k, h):
        def one(hs, r):
            return mgs.precondition(hs, r)
        return jax.vmap(one)(h, x0 + 1e-9 * k)

    f = jax.jit(vc)
    print("1x V-cycle        %.3f s" % timeit(f, hier), flush=True)

    def coarse(k, h):
        rH = jnp.ones((bs, mgs.systems[-1].num_vars), jnp.float32) + 1e-3 * k
        return jnp.einsum("bij,bj->bi", h["coarse_inv"], rH)

    f = jax.jit(coarse)
    print("coarsest solve    %.3f s" % timeit(f, hier), flush=True)

    def fine_mv(k):
        from mech_nn_discovery_pde_tpu.ops.structured import split_values
        fmv, frmv = mgs._sops[0]
        def one(v, x):
            sv = split_values(sys0.spec, v)
            def body(i, x):
                return frmv(sv, fmv(sv, x)) * 0.5 + x
            return jax.lax.fori_loop(0, 20, body, x)
        return jax.vmap(one)(values + 1e-12 * k, x0)

    f = jax.jit(fine_mv)
    print("20x f64 normal mv %.3f s" % timeit(f), flush=True)

    # ---- assembled block-stencil normal operator (ops/normal_stencil) ----
    from mech_nn_discovery_pde_tpu.ops.structured import split_values

    desc, sbuild, sapply = mgs._nstencil[0]

    def stencil_build(k):
        def one(v):
            return sbuild(split_values(sys0.spec, v.astype(jnp.float32)))
        return jax.vmap(one)(values + 1e-12 * k)

    f = jax.jit(stencil_build)
    print("stencil build f32 %.3f s" % timeit(f), flush=True)
    coef32 = f(0)

    def stencil_mv20(k, c):
        def one(ci, x):
            def body(i, x):
                return sapply(ci, x) * 0.5 + x
            return jax.lax.fori_loop(0, 20, body, x)
        return jax.vmap(one)(c, x32 + 1e-3 * k)

    f = jax.jit(stencil_mv20)
    print("20x f32 stencil mv %.3f s" % timeit(f, coef32), flush=True)

    def stencil_build64(k):
        def one(v):
            return sbuild(split_values(sys0.spec, v))
        return jax.vmap(one)(values + 1e-12 * k)

    coef64 = jax.jit(stencil_build64)(0)

    def stencil_mv20_64(k, c):
        def one(ci, x):
            def body(i, x):
                return sapply(ci, x) * 0.5 + x
            return jax.lax.fori_loop(0, 20, body, x)
        return jax.vmap(one)(c, x0 + 1e-9 * k)

    f = jax.jit(stencil_mv20_64)
    print("20x f64 stencil mv %.3f s" % timeit(f, coef64), flush=True)


if __name__ == "__main__":
    main()

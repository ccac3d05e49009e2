import sys; sys.path.insert(0, ".")  # noqa: E402
"""GL multigrid train-step wall time with properly varied inputs."""

import time

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import optax

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.discovery.ginzburg_landau import GLConfig, GLDiscovery


class TinyDS:
    t_step_size = 0.2
    x_step_size = 0.3906
    y_step_size = 0.3906


def main():
    bs, dims, ng = 32, (8, 32, 32), 3
    cfg = GLConfig(batch_size=bs, solver_dim=dims, n_grid=ng, nn_transform=False,
                   pde=PDEConfig(precision="f32_ir", mg_solve_dtype="f32"))
    model = GLDiscovery(cfg, TinyDS())
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-5)
    opt_state = opt.init(params)

    def step(pp, oo, uu, vv):
        (l, aux), g = jax.value_and_grad(model.loss_fn, has_aux=True)(pp, uu, vv)
        upd, oo = opt.update(g, oo, pp)
        return optax.apply_updates(pp, upd), oo, l

    jstep = jax.jit(step)
    u = jnp.asarray(rng.standard_normal((bs,) + dims) * 0.3)
    v = jnp.asarray(rng.standard_normal((bs,) + dims) * 0.3)
    t0 = time.time()
    params, opt_state, l = jstep(params, opt_state, u, v)
    jax.block_until_ready(l)
    print("compile+first step %.1fs, loss %.4f" % (time.time() - t0, float(l)), flush=True)
    # params/opt_state evolve every call -> nothing cacheable
    t0 = time.time()
    n = 4
    for k in range(n):
        params, opt_state, l = jstep(params, opt_state, u + 1e-6 * k, v)
    jax.block_until_ready(l)
    dt = (time.time() - t0) / n
    print("GL MG train step %.2fs/batch (bs=%d) -> 64-batch epoch %.0fs" % (dt, bs, dt * 64), flush=True)


if __name__ == "__main__":
    main()

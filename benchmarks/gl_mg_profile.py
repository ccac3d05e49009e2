import sys; sys.path.insert(0, ".")  # noqa: E402
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp, numpy as np, time
from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer
from mech_nn_discovery_pde_tpu.discovery.ginzburg_landau import GLDiscovery, GLConfig

bs, dims, ng = 32, (8,32,32), 3
cfg = GLConfig(batch_size=bs, solver_dim=dims, n_grid=ng, nn_transform=False,
               pde=PDEConfig(precision='f32_ir', mg_solve_dtype='f32'))
class TinyDS:
    t_step_size = 0.2; x_step_size = 0.3906; y_step_size = 0.3906
t0=time.time()
model = GLDiscovery(cfg, TinyDS())
print('build time %.1fs' % (time.time()-t0), flush=True)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((bs,)+dims)*0.3)
v = jnp.asarray(rng.standard_normal((bs,)+dims)*0.3)
params = model.init(jax.random.PRNGKey(0))

# forward-only solve timing
fwd = jax.jit(lambda pp, uu, vv: model.forward(pp, uu, vv)[0])
t0=time.time(); out = fwd(params, u, v); jax.block_until_ready(out)
print('fwd compile+run %.1fs' % (time.time()-t0), flush=True)
t0=time.time()
for k in range(3): out = fwd(params, u + 1e-9*k, v)
jax.block_until_ready(out)
tf = (time.time()-t0)/3
print('GL MG forward per batch: %.3fs (bs=%d)' % (tf, bs), flush=True)

# fwd+bwd (epoch-relevant)
import optax
opt = optax.adam(1e-5); opt_state = opt.init(params)
def step(pp, oo, uu, vv):
    (l, aux), g = jax.value_and_grad(model.loss_fn, has_aux=True)(pp, uu, vv)
    upd, oo = opt.update(g, oo, pp)
    return optax.apply_updates(pp, upd), oo, l
jstep = jax.jit(step)
t0=time.time(); p2,o2,l = jstep(params, opt_state, u, v); jax.block_until_ready(l)
print('fwd+bwd compile+run %.1fs' % (time.time()-t0), flush=True)
t0=time.time()
for k in range(3): p2,o2,l = jstep(params, opt_state, u+1e-9*k, v)
jax.block_until_ready(l)
tb=(time.time()-t0)/3
print('GL MG train step: %.3fs/batch -> epoch(64 batches): %.1fs' % (tb, tb*64), flush=True)
# residual quality
sys0 = model.layer.mg_solver.systems[0]
coeffs = jnp.zeros((bs, model.layer.grid_size, model.layer.n_orders)).at[...,1].set(1.0).at[...,5].set(-0.1).at[...,6].set(-0.1)
rhs = jnp.zeros((bs, model.layer.grid_size))
iv = jnp.asarray(0.1*rng.standard_normal((bs, sys0.n_init_rows)))
steps_l = [jnp.asarray(np.full((bs,d-1),0.1)) for d in dims]
values = sys0.fill_values(coeffs, steps_l, dtype=jnp.float64)
rhs_vec = sys0.fill_rhs(rhs, iv, dtype=jnp.float64)
mgs = model.layer.mg_solver
hier = mgs.build_hierarchy(coeffs, rhs, iv, steps_l, values)
x, iters, rnorm = jax.jit(lambda v,r,h: mgs.solve_normal(v,r,h))(values, rhs_vec, hier)
atb = jax.vmap(sys0.rmatvec)(values, rhs_vec)
rel = np.asarray(rnorm)/np.asarray(jnp.linalg.norm(atb,axis=1))
print('GL FGMRES iters', np.asarray(iters)[:4], 'rel rnorm median %.2e max %.2e' % (np.median(rel), rel.max()), flush=True)

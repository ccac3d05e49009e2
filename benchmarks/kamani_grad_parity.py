"""Gradient-parity oracle: our Kamani solve/loss vs the reference's own
torch implementation, run as a black box on CPU.

Motivation: every probed init (flax seeds 0/1/2/10, torch-init seed 0) and
the full 5000-epoch seed-0 run land in the same lazy basin (p1 row pinned,
loss ~8 vs ~1.3 at the true parameters).  Before concluding the shipped
reference protocol itself cannot recover from generic inits, rule out
implementation drift in the part that shapes training dynamics: d loss /
d (pr, er, up) through the differentiable solve.  The nets are bypassed —
both sides get IDENTICAL (pr, er, up) tensors, so this isolates the
solve + IFT gradient + loss composition (reference discovery/kamani.py
solve():231-278, optimize():509-557).

Runs the reference module in-process (CPU torch, f64) from a scratch cwd
with its shipped dataset symlinked; stubs only `ipdb`.
"""

import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SCRATCH = "/tmp/refrun"
sys.path.insert(0, REPO)


def load_reference():
    os.makedirs(SCRATCH, exist_ok=True)
    data_link = os.path.join(SCRATCH, "data")
    if not os.path.islink(data_link):
        os.symlink(os.path.join(REF, "data"), data_link)
    os.chdir(SCRATCH)
    sys.modules.setdefault("ipdb", types.ModuleType("ipdb"))
    sys.path.insert(0, os.path.join(REF, "discovery"))
    sys.path.insert(0, REF)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_kamani", os.path.join(REF, "discovery", "kamani.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_kamani"] = mod
    spec.loader.exec_module(mod)  # module-level: ds + model on CPU
    return mod


def batch_from(ds, bs, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(ds), size=bs, replace=False)
    items = [ds[int(i)] for i in idx]
    import torch

    t, u, s, sd, sdd = (torch.stack([it[k] for it in items]).double()
                        for k in range(5))
    return t, u, s, sd, sdd


def torch_grads(mod, pr, er, up, u, s, sd, sdd):
    import torch

    model = mod.model.double()
    pr_t = torch.tensor(pr, dtype=torch.float64, requires_grad=True)
    er_t = torch.tensor(er, dtype=torch.float64, requires_grad=True)
    up_t = torch.tensor(up, dtype=torch.float64, requires_grad=True)
    steps_list = model.get_steps(u, None)
    u0 = model.solve(u, up_t, [pr_t, er_t], [s, sd, sdd], steps_list)
    bs = u.shape[0]
    u0 = u0.reshape(bs, -1)
    u_loss = (u0 - u.reshape(bs, -1)).abs().mean(dim=-1)
    var_loss = (up_t.reshape(bs, -1) - u0).abs().mean(dim=-1)
    loss = u_loss.mean() + var_loss.mean() + 0.01 * pr_t.abs().sum()
    gpr, ger, gup = torch.autograd.grad(loss, (pr_t, er_t, up_t))
    return (float(loss), float(u_loss.mean()), float(var_loss.mean()),
            gpr.numpy(), ger.numpy(), gup.numpy(), u0.detach().numpy())


def jax_grads(pr, er, up, u, sd, sdd, bs, nt, t_step):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    layer = PDEDenseLayer(
        bs=bs, coord_dims=(nt,), order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=[lambda n: (0, 0, [0], [0])], solver_dbl=True,
        config=PDEConfig(precision="f64"),
    )
    steps = [jnp.full((bs, nt - 1), t_step, jnp.float64)]

    def loss_fn(pr, er, up):
        sa = jnp.abs(sd)
        basis = lambda i: (pr[i, 0] + pr[i, 1] * sa ** er[i, 0]
                           + pr[i, 2] * sa ** er[i, 1])
        p0, p1, p2, p3 = (basis(i) for i in range(4))
        coeffs = jnp.zeros((bs, layer.grid_size, layer.n_orders))
        coeffs = coeffs.at[..., 0].set(p3).at[..., 1].set(p0)
        rhs = p1 * sd + p2 * sdd
        iv = up[:, 0:1]
        u0, _, _ = layer(coeffs, rhs, iv, steps)
        u0 = u0.reshape(bs, -1)
        u_loss = jnp.abs(u0 - u).mean(axis=-1)
        var_loss = jnp.abs(up - u0).mean(axis=-1)
        loss = u_loss.mean() + var_loss.mean() + 0.01 * jnp.abs(pr).sum()
        return loss, (u_loss.mean(), var_loss.mean(), u0)

    (loss, (ul, vl, u0)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(jnp.asarray(pr), jnp.asarray(er), jnp.asarray(up))
    import numpy as np

    return (float(loss), float(ul), float(vl),
            *(np.asarray(g) for g in grads), np.asarray(u0))


def compare(tag, a, b):
    import numpy as np

    a, b = np.asarray(a), np.asarray(b)
    denom = max(np.abs(a).max(), 1e-12)
    print(f"  {tag}: rel max diff {np.abs(a - b).max() / denom:.3e} "
          f"(|ref|max {np.abs(a).max():.3e})")


def main():
    import numpy as np

    mod = load_reference()
    bs = mod.batch_size  # 2048 (model bs is baked in)
    nt = mod.solver_dim[0]
    t, u, s, sd, sdd = batch_from(mod.ds, bs)
    t_step = float(mod.ds.t_step)

    from mech_nn_discovery_pde_tpu.discovery.kamani import true_params

    cases = {"true": true_params()}
    rng = np.random.default_rng(1)
    cases["random"] = (rng.standard_normal((4, 3)),
                       np.clip(rng.standard_normal((4, 2)), -1.5, 1.5))
    lazy_pr = np.array([[4.4, 7.7, 7.1], [0.0, 0.0, 0.0],
                        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    lazy_er = np.array([[1.98, -1.97], [-1.96, 0.77],
                        [1.96, -1.67], [1.11, 0.97]])
    cases["lazy"] = (lazy_pr, lazy_er)

    up = u.numpy() + 0.05 * rng.standard_normal(u.shape)

    for name, (pr, er) in cases.items():
        pr = np.array(pr, dtype=np.float64)
        pr[3] = [1.0, 0.0, 0.0]  # pinned row, as both get_params do
        er = np.array(er, dtype=np.float64)
        print(f"=== case {name} ===")
        tl, tul, tvl, tgpr, tger, tgup, tu0 = torch_grads(
            mod, pr, er, up, u, s, sd, sdd)
        jl, jul, jvl, jgpr, jger, jgup, ju0 = jax_grads(
            pr, er, up, u.numpy(), sd.numpy(), sdd.numpy(), bs, nt, t_step)
        print(f"  loss ref {tl:.6f} ours {jl:.6f}   u_loss {tul:.6f}/"
              f"{jul:.6f}  var {tvl:.6f}/{jvl:.6f}")
        compare("u0", tu0, ju0)
        compare("d/dpr", tgpr, jgpr)
        compare("d/der", tger, jger)
        compare("d/dup", tgup, jgup)


if __name__ == "__main__":
    main()

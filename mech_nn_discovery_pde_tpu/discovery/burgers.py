"""Viscous Burgers equation discovery (dense path).

Rebuilds discovery/burgers_dparam_viscous.py: learn the coefficients of

    u_t + p(u) u_x + q(u) u_xx = r(u)

over the basis {1, u, u^2, u^3, u^4} for each of p, q, r, from (32, 32)
patches of a viscous Burgers trajectory, through the differentiable dense PDE
layer.  True equation: u_t + u u_x - nu u_xx = 0 (p has u-coefficient 1, q
constant -nu, everything else 0, up to the L1 push).

Structure per reference: a 2D ResNet denoises the FULL field once per step
(:290-303); patches are gathered at the batch's (t, x) offsets; three
ParamNets (3-hidden-layer MLPs, :189-211) emit 5 basis coefficients each;
boundary values come from the denoised patches (:236-243); loss =
|u0 - data| * frame_mask + |up - u0| + l1 * |params| (:375-382).

Run:  python -m mech_nn_discovery_pde_tpu.discovery.burgers
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.data.datasets import BurgersDataset, PatchLoader
from mech_nn_discovery_pde_tpu.discovery.common import (
    TrainHarness,
    fixed_steps,
    make_update,
)
from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer
from mech_nn_discovery_pde_tpu.models.paramnet import ParamNet
from mech_nn_discovery_pde_tpu.models.resnet import ResNet
from mech_nn_discovery_pde_tpu.utils import logger as logging_util
from mech_nn_discovery_pde_tpu.utils import rundir


@dataclass
class BurgersConfig:
    solver_dim: tuple = (32, 32)
    batch_size: int = 10
    lr: float = 5e-6
    param_l1: float = 0.005
    nn_transform: bool = True
    noise_percent: float = 0.0
    frame_drop_prob: float = 0.0
    epochs: int = 5000
    steps_per_epoch: Optional[int] = None  # None = full pass
    seed: int = 10
    data_root: str = "data"
    # resume training from an existing run dir's checkpoints (else new run)
    resume_from: Optional[str] = None
    ckpt_every: int = 25
    pde: PDEConfig = field(
        default_factory=lambda: PDEConfig(precision="f32_ir", log_solves=True)
    )


BASIS_TEXT = [
    "{0:.4f} u_x + {1:.4f} u*u_x + {2:.4f} u^2*u_x + {3:.4f} u^3*u_x + {4:.4f} u^4*u_x",
    "{0:.4f} u_xx + {1:.4f} u*u_xx + {2:.4f} u^2*u_xx + {3:.4f} u^3*u_xx + {4:.4f} u^4*u_xx",
    "{0:.4f} + {1:.4f} u + {2:.4f} u^2 + {3:.4f} u^3 + {4:.4f} u^4",
]


def print_eq(params: np.ndarray) -> str:
    return (
        "u_t + " + BASIS_TEXT[0].format(*params[0]) + "\n"
        + BASIS_TEXT[1].format(*params[1]) + "\n"
        + " = " + BASIS_TEXT[2].format(*params[2])
    )


class BurgersDiscovery:
    """Model container: flax modules + PDE layer + jittable loss."""

    # boundary boxes: t=0 row, x=0 column, x=end column (reference :170-173)
    IV_LIST = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
        lambda nx, ny: (1, 0, [0, ny - 1], [nx - 1, ny - 1]),
    ]

    def __init__(self, cfg: BurgersConfig, ds: BurgersDataset):
        self.cfg = cfg
        self.ds = ds
        dims = cfg.solver_dim
        self.layer = PDEDenseLayer(
            bs=cfg.batch_size, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
            init_index_mi_list=self.IV_LIST, solver_dbl=True, config=cfg.pde,
        )
        self.resnet = ResNet(out_channels=1, in_channels=1)
        self.pnets = [ParamNet(n_out=5, depth=3) for _ in range(3)]
        self.steps = [
            fixed_steps(ds.t_step, cfg.batch_size, dims[0], 0.005, 0.5),
            fixed_steps(ds.x_step, cfg.batch_size, dims[1], 0.005, 0.5),
        ]
        self.data_all = jnp.asarray(ds.data)
        self.frame_mask = jnp.asarray(ds.frame_mask)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {
            "resnet": self.resnet.init(keys[0], jnp.zeros((1, 8, 8, 1))),
            "pnets": [p.init(k) for p, k in zip(self.pnets, keys[1:])],
        }
        return params

    def get_params(self, params) -> jnp.ndarray:
        """(3, 5) basis coefficients."""
        return jnp.concatenate(
            [p.apply(w) for p, w in zip(self.pnets, params["pnets"])], axis=0
        )

    def _gather_patches(self, field, t_idx, x_idx):
        dims = self.cfg.solver_dim

        def one(t0, x0):
            return jax.lax.dynamic_slice(field, (t0, x0), dims)

        return jax.vmap(one)(t_idx, x_idx)

    def get_iv_bc(self, up):
        """Boundary values from the (denoised) patch (reference :236-243):
        t=0 row (first ny-1 cols), x=0 col (rows 1..), x=end col (all rows)."""
        d0, d1 = self.cfg.solver_dim
        u1 = up[:, 0, : d1 - 1]
        u2 = up[:, 1:d0, 0]
        u4 = up[:, 0:d0, d1 - 1]
        return jnp.concatenate([u1, u2, u4], axis=-1)

    def forward(self, params, u_patches, t_idx, x_idx):
        cfg = self.cfg
        bs = cfg.batch_size
        if cfg.nn_transform:
            # networks run in f32 (f64 is emulated on TPU); the solver
            # boundary casts to the solve dtype
            full = self.resnet.apply(
                params["resnet"],
                self.data_all.astype(jnp.float32)[None, :, :, None],
            )[0, :, :, 0].astype(self.data_all.dtype)
        else:
            full = self.data_all
        up = self._gather_patches(full, t_idx, x_idx)  # (bs, nt, nx)

        iv_rhs = self.get_iv_bc(up)
        upf = up.reshape(bs, -1)
        basis = jnp.stack([jnp.ones_like(upf), upf, upf**2, upf**3, upf**4], axis=-1)
        bp = self.get_params(params)
        p = (basis * bp[0]).sum(-1)
        q = (basis * bp[1]).sum(-1)
        r = (basis * bp[2]).sum(-1)

        coeffs = jnp.zeros((bs, self.layer.grid_size, self.layer.n_orders))
        coeffs = coeffs.at[..., 1].set(1.0)  # u_t
        coeffs = coeffs.at[..., 2].set(p)  # u_x
        coeffs = coeffs.at[..., 4].set(q)  # u_xx
        rhs = r

        u0, u, _ = self.layer(coeffs, rhs, iv_rhs, list(self.steps))
        return u0.reshape(bs, -1), up.reshape(bs, -1), bp

    def loss_fn(self, params, u_patches, t_idx, x_idx):
        cfg = self.cfg
        bs = cfg.batch_size
        u0, up, bp = self.forward(params, u_patches, t_idx, x_idx)
        target = u_patches.reshape(bs, -1)
        dmask = self.frame_mask[t_idx][:, None]  # whole-patch mask by first frame
        x_loss = jnp.abs(u0 * dmask - target * dmask).mean(axis=-1)
        var_loss = jnp.abs(up - u0).mean(axis=-1)
        param_loss = jnp.abs(bp).mean()
        loss = x_loss.mean() + var_loss.mean() + cfg.param_l1 * param_loss
        return loss, {"x_loss": x_loss.mean(), "var_loss": var_loss.mean()}


def train(cfg: Optional[BurgersConfig] = None, log=None):
    cfg = cfg or BurgersConfig()
    if cfg.resume_from:
        log_dir, run_id = cfg.resume_from, cfg.resume_from
    else:
        log_dir, run_id = rundir.create_log_dir(root="logs/burgers", reuse=False)
    rundir.write_source_files(log_dir)
    log = log or logging_util.setup(log_dir, name="burgers")
    log.info(f"Burgers viscous discovery, solver dim {cfg.solver_dim}")

    ds = BurgersDataset(
        solver_dim=cfg.solver_dim, data_root=cfg.data_root,
        noise_percent=cfg.noise_percent, frame_drop_prob=cfg.frame_drop_prob,
    )
    model = BurgersDiscovery(cfg, ds)
    params = model.init(jax.random.PRNGKey(cfg.seed))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    update = make_update(model.loss_fn, optimizer)
    loader = PatchLoader(ds, cfg.batch_size, seed=cfg.seed)

    harness = TrainHarness(log_dir, params, opt_state, log=log,
                           ckpt_every=cfg.ckpt_every)
    params, opt_state = harness.params, harness.opt_state
    for epoch in range(harness.start_epoch, cfg.epochs):
        losses = []
        for i, (patch, t_idx, x_idx) in enumerate(loader):
            if cfg.steps_per_epoch and i >= cfg.steps_per_epoch:
                break
            with harness.timer.phase("update"):
                params, opt_state, loss, aux = update(
                    params, opt_state, jnp.asarray(patch), jnp.asarray(t_idx),
                    jnp.asarray(x_idx),
                )
                losses.append(float(loss))
        eq = print_eq(np.asarray(model.get_params(params)))
        log.info(f"Learned\n{eq}\n")
        log.info(f"run {run_id} epoch {epoch}, loss {np.mean(losses):.3E}")
        harness.end_epoch(epoch, params, opt_state)
    return params, model


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    train()

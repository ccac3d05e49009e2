"""Ginzburg-Landau reaction-diffusion discovery (sparse multigrid path).

Rebuilds discovery/ginzburg_landau.py: learn one equation of the coupled
complex GL system at a time (u = Re A, v = Im A by default) as

    u_t + p0(u, v) u + p1(u) u_xx + p2(u) u_yy = p3(v)

over bases {1, u, u^2, v, v^2, uv} for p0, {1, u, u^2} for p1/p2 and
{v, v^2, v^3} for p3 (:354-374), from (8, 32, 32) t-x-y patches through the
MultigridLayer (n_grid 3, downsample_first=False, :241-243).  Five boundary
faces provide Dirichlet data (:226-237).

Run:  python -m mech_nn_discovery_pde_tpu.discovery.ginzburg_landau
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.data.datasets import PatchLoader, ReactDiffDataset
from mech_nn_discovery_pde_tpu.discovery.common import (
    TrainHarness,
    fixed_steps,
    make_update,
)
from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer
from mech_nn_discovery_pde_tpu.models.paramnet import ParamNet
from mech_nn_discovery_pde_tpu.models.resnet import ResNet
from mech_nn_discovery_pde_tpu.utils import logger as logging_util
from mech_nn_discovery_pde_tpu.utils import rundir


@dataclass
class GLConfig:
    solver_dim: tuple = (8, 32, 32)
    n_grid: int = 3
    batch_size: int = 32
    lr: float = 1e-5
    epochs: int = 500
    steps_per_epoch: Optional[int] = None
    resume_from: Optional[str] = None
    ckpt_every: int = 25
    threshold: float = 0.1
    first_equation: bool = True
    nn_transform: bool = False
    downsample: int = 2
    noise_percent: float = 0.0
    seed: int = 10
    data_root: str = "data"
    # run the backward-solve convergence probe every N epochs (0 = off);
    # compiles a second (smaller) TPU graph on first use
    backward_probe_every: int = 0
    # validated TPU configuration: f32 factorizations + f64-residual
    # refinement, f32 outer FGMRES, per-solve forward diagnostics returned
    # in-band (axon has no host callbacks)
    pde: PDEConfig = field(
        default_factory=lambda: PDEConfig(
            precision="f32_ir", mg_solve_dtype="f32", log_solves=True,
            return_solve_stats=True,
        )
    )


BASIS_TEXT = [
    "{0:.4f} u + {1:.4f} u^2 + {2:.4f} u^3 + {3:.4f} u*v + {4:.4f} u*v^2 + {5:.4f} u^2*v",
    "{0:.4f} u_xx + {1:.4f} u*u_xx + {2:.4f} u^2*u_xx",
    "{0:.4f} u_yy + {1:.4f} u*u_yy + {2:.4f} u^2*u_yy",
    "{0:.4f} v + {1:.4f} v^2 + {2:.4f} v^3",
]


def print_eq(params) -> str:
    return (
        "u_t + " + BASIS_TEXT[0].format(*params[0][:6]) + "\n"
        + BASIS_TEXT[1].format(*params[1][:3]) + "\n"
        + BASIS_TEXT[2].format(*params[2][:3]) + "\n"
        + " = " + BASIS_TEXT[3].format(*params[3][:3])
    )


class GLDiscovery:
    # five Dirichlet boundary faces (reference :226-237)
    IV_LIST = [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
        lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
    ]

    def __init__(self, cfg: GLConfig, ds: ReactDiffDataset):
        self.cfg = cfg
        self.ds = ds
        dims = cfg.solver_dim
        self.layer = MultigridLayer(
            bs=cfg.batch_size, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
            init_index_mi_list=self.IV_LIST, solver_dbl=True,
            n_grid=cfg.n_grid, downsample_first=False, config=cfg.pde,
        )
        self.rnet1 = ResNet(out_channels=1, in_channels=1)
        self.rnet2 = ResNet(out_channels=1, in_channels=1)
        self.pnets = [ParamNet(n_out=10, depth=2) for _ in range(4)]
        self.steps = [
            fixed_steps(ds.t_step_size, cfg.batch_size, dims[0]),
            fixed_steps(ds.x_step_size, cfg.batch_size, dims[1]),
            fixed_steps(ds.y_step_size, cfg.batch_size, dims[2]),
        ]

    def init(self, key):
        keys = jax.random.split(key, 6)
        dims = self.cfg.solver_dim
        dummy = jnp.zeros((1, dims[1], dims[2], 1))
        return {
            "rnet1": self.rnet1.init(keys[0], dummy),
            "rnet2": self.rnet2.init(keys[1], dummy),
            "pnets": [p.init(k) for p, k in zip(self.pnets, keys[2:])],
        }

    def get_params(self, params):
        return [p.apply(w)[0] for p, w in zip(self.pnets, params["pnets"])]

    def get_iv(self, u):
        """Dirichlet data for the five faces, in box C-order (:296-311)."""
        bs = u.shape[0]
        d0, d1, d2 = self.cfg.solver_dim
        u1 = u[:, 0, :, :].reshape(bs, -1)
        u2 = u[:, 1:d0, 0, :].reshape(bs, -1)
        u3 = u[:, 1:d0, 1:d1, 0].reshape(bs, -1)
        u4 = u[:, 1:d0, d1 - 1, 1:d2].reshape(bs, -1)
        u5 = u[:, 1:d0, 1 : d1 - 1, d2 - 1].reshape(bs, -1)
        return jnp.concatenate([u1, u2, u3, u4, u5], axis=-1)

    def _assemble(self, params, u, v):
        """(coeffs, rhs, iv_rhs, up, pl) for one batch — shared by the
        training forward and the backward-convergence probe."""
        cfg = self.cfg
        bs = cfg.batch_size
        dims = cfg.solver_dim
        if cfg.nn_transform:
            u_in = u.reshape(bs * dims[0], dims[1], dims[2], 1).astype(jnp.float32)
            v_in = v.reshape(bs * dims[0], dims[1], dims[2], 1).astype(jnp.float32)
            up = self.rnet1.apply(params["rnet1"], u_in).reshape(bs, *dims).astype(u.dtype)
            vp = self.rnet2.apply(params["rnet2"], v_in).reshape(bs, *dims).astype(u.dtype)
        else:
            up, vp = u, v

        iv_rhs = self.get_iv(up)
        up0 = up.reshape(bs, -1)
        vp0 = vp.reshape(bs, -1)
        pl = self.get_params(params)
        basis0 = jnp.stack(
            [jnp.ones_like(up0), up0, up0**2, vp0, vp0**2, up0 * vp0], axis=-1
        )
        basis2 = jnp.stack([jnp.ones_like(up0), up0, up0**2], axis=-1)
        basis3 = jnp.stack([vp0, vp0**2, vp0**3], axis=-1)

        p0 = (basis0 * pl[0][:6]).sum(-1)
        p1 = (basis2 * pl[1][:3]).sum(-1)
        p2 = (basis2 * pl[2][:3]).sum(-1)
        p3 = (basis3 * pl[3][:3]).sum(-1)

        coeffs = jnp.zeros((bs, self.layer.grid_size, self.layer.n_orders))
        # 3D mi order: [u, u_t, u_x, u_y, u_tt, u_xx, u_yy]
        coeffs = coeffs.at[..., 0].set(p0)
        coeffs = coeffs.at[..., 1].set(1.0)
        coeffs = coeffs.at[..., 5].set(p1)
        coeffs = coeffs.at[..., 6].set(p2)
        rhs = p3
        return coeffs, rhs, iv_rhs, up, pl

    def forward(self, params, u, v):
        bs = self.cfg.batch_size
        coeffs, rhs, iv_rhs, up, pl = self._assemble(params, u, v)
        u0, _, stats = self.layer(coeffs, rhs, iv_rhs, list(self.steps))
        return u0.reshape(bs, -1), up.reshape(bs, -1), pl, stats

    def backward_probe(self, params, u, v):
        """Backward-solve convergence on a representative cotangent (the
        normalized data field scattered into the solution-value slots) —
        periodic observability for the IFT backward on callback-free
        backends."""
        bs = self.cfg.batch_size
        coeffs, rhs, iv_rhs, _, _ = self._assemble(params, u, v)
        gu = u.reshape(bs, -1)
        gu = gu / jnp.maximum(jnp.linalg.norm(gu, axis=1, keepdims=True), 1e-30)
        g = jnp.zeros((bs, self.layer.grid_size, self.layer.n_orders))
        g = g.at[..., 0].set(gu.reshape(bs, self.layer.grid_size))
        return self.layer.backward_stats(
            coeffs, rhs, iv_rhs, list(self.steps), g.reshape(bs, -1)
        )

    def loss_fn(self, params, u, v):
        """Reference loss (ginzburg_landau.py:494-502): |u0 - u| +
        |u' - u| + |v' - v| + 1e-4 L1(params), where u'/v' are the (possibly
        identity) learned transforms of the raw fields."""
        bs = self.cfg.batch_size
        u0, up, pl, stats = self.forward(params, u, v)
        target_u = u.reshape(bs, -1)
        target_v = v.reshape(bs, -1)
        u_loss = jnp.abs(u0 - target_u).mean(axis=-1)
        var_u_loss = jnp.abs(up - target_u).mean(axis=-1)
        # vp == v when nn_transform is off; recompute for the general case
        if self.cfg.nn_transform:
            dims = self.cfg.solver_dim
            v_in = v.reshape(bs * dims[0], dims[1], dims[2], 1).astype(jnp.float32)
            vp = self.rnet2.apply(params["rnet2"], v_in).reshape(bs, -1).astype(u.dtype)
        else:
            vp = target_v
        var_v_loss = jnp.abs(vp - target_v).mean(axis=-1)
        param_loss = sum(jnp.abs(p).sum() for p in pl)
        loss = (
            u_loss.mean() + var_u_loss.mean() + var_v_loss.mean()
            + 1e-4 * param_loss
        )
        aux = {"u_loss": u_loss.mean(), "var_u_loss": var_u_loss.mean()}
        if stats is not None:
            # per-step forward-solve convergence, in-band (no host callback)
            aux["fwd_iters"] = stats["iters"].mean()
            aux["fwd_rel_rnorm"] = stats["rel_rnorm"].max()
        return loss, aux


def train(cfg: Optional[GLConfig] = None, log=None):
    cfg = cfg or GLConfig()
    if cfg.resume_from:
        log_dir, run_id = cfg.resume_from, cfg.resume_from
    else:
        log_dir, run_id = rundir.create_log_dir(root="logs/gl", reuse=False)
    rundir.write_source_files(log_dir)
    log = log or logging_util.setup(log_dir, name="gl")
    log.info(f"Ginzburg-Landau discovery, solver dim {cfg.solver_dim}")

    ds = ReactDiffDataset(
        solver_dim=cfg.solver_dim, data_root=cfg.data_root,
        downsample=cfg.downsample, first_equation=cfg.first_equation,
        noise_percent=cfg.noise_percent,
    )
    model = GLDiscovery(cfg, ds)
    params = model.init(jax.random.PRNGKey(cfg.seed))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    update = make_update(model.loss_fn, optimizer)
    loader = PatchLoader(ds, cfg.batch_size, seed=cfg.seed)

    harness = TrainHarness(log_dir, params, opt_state, log=log,
                           ckpt_every=cfg.ckpt_every)
    params, opt_state = harness.params, harness.opt_state
    bprobe = None
    for epoch in range(harness.start_epoch, cfg.epochs):
        losses = []
        aux = {}
        for i, (u, v, t, x, y) in enumerate(loader):
            if cfg.steps_per_epoch and i >= cfg.steps_per_epoch:
                break
            with harness.timer.phase("update"):
                params, opt_state, loss, aux = update(
                    params, opt_state, jnp.asarray(u), jnp.asarray(v)
                )
                losses.append(float(loss))
        pl = [np.asarray(p) for p in model.get_params(params)]
        log.info(print_eq(pl))
        msg = f"run {run_id} epoch {epoch}, loss {np.mean(losses):.3E}"
        if "fwd_iters" in aux:
            msg += (f"  fwd solve iters {float(aux['fwd_iters']):.1f}"
                    f" rel_rnorm {float(aux['fwd_rel_rnorm']):.2e}")
        log.info(msg)
        if cfg.backward_probe_every and (epoch + 1) % cfg.backward_probe_every == 0:
            if bprobe is None:
                bprobe = jax.jit(model.backward_probe)
            with harness.timer.phase("backward_probe"):
                bs_ = bprobe(params, jnp.asarray(u), jnp.asarray(v))
            log.info(
                f"bwd solve iters {float(bs_['iters'].mean()):.1f} "
                f"rel_rnorm {float(bs_['rel_rnorm'].max()):.2e} "
                f"finite {bool(np.asarray(bs_['finite']).all())}"
            )
        harness.end_epoch(epoch, params, opt_state)
    return params, model


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    train()

"""Sine-surface PDE fit (inverse problem, dense path).

Rebuilds fit/sine_pde_dense.py: fit a damped sine surface on a (32, 32) grid
by learning *constant* PDE coefficients and a source term directly (no
discovery bases) — MLP heads over a learned latent produce the per-mi
coefficients and the rhs grid (:94-176); boundary values are taken from the
data's edges (:64-74).  The reference drives this with pytorch_lightning; we
use a plain optax loop (Trainer-equivalent harness below).

Run:  python -m mech_nn_discovery_pde_tpu.fit.sine_fit
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mech_nn_discovery_pde_tpu.config import PDEConfig
from mech_nn_discovery_pde_tpu.data.generate import damped_sine
from mech_nn_discovery_pde_tpu.discovery.common import fixed_steps, make_update
from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer
from mech_nn_discovery_pde_tpu.utils import logger as logging_util
from mech_nn_discovery_pde_tpu.utils import rundir


@dataclass
class SineFitConfig:
    coord_dims: tuple = (32, 32)
    lr: float = 1e-4
    epochs: int = 100
    time_varying_source: bool = True
    seed: int = 0
    pde: PDEConfig = field(default_factory=lambda: PDEConfig(precision="f32_ir"))


class SineHeads(nn.Module):
    """Learned latent -> shared trunk -> (coeffs, rhs) heads (reference
    Sine._dfnn/cf_nn/rhs_nn, :131-149)."""

    grid_size: int
    n_orders: int
    time_varying_source: bool = True

    @nn.compact
    def __call__(self):
        z = self.param("latent", nn.initializers.normal(1.0), (1, 1024), jnp.float32)
        h = nn.relu(nn.Dense(1024)(z))
        h = nn.relu(nn.Dense(1024)(h))
        coeffs = nn.Dense(self.n_orders)(h)  # constant over the grid
        if self.time_varying_source:
            rhs = nn.Dense(self.grid_size)(h)
        else:
            rhs = jnp.zeros((1, self.grid_size))
        return coeffs, rhs


class SineFit:
    # boundary boxes: all four edges Dirichlet (reference :111-115)
    IV_LIST = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
        lambda nx, ny: (0, 0, [nx - 1, 1], [nx - 1, ny - 2]),
        lambda nx, ny: (1, 0, [0, ny - 1], [nx - 1, ny - 1]),
    ]

    def __init__(self, cfg: SineFitConfig):
        self.cfg = cfg
        self.layer = PDEDenseLayer(
            bs=1, coord_dims=cfg.coord_dims, order=2, n_ind_dim=1, n_iv=1,
            init_index_mi_list=self.IV_LIST, solver_dbl=True, config=cfg.pde,
        )
        self.heads = SineHeads(
            grid_size=self.layer.grid_size, n_orders=self.layer.n_orders,
            time_varying_source=cfg.time_varying_source,
        )
        self.steps = [
            fixed_steps(0.05, 1, cfg.coord_dims[0], 0.005, 0.1),
            fixed_steps(0.05, 1, cfg.coord_dims[1], 0.005, 0.1),
        ]

    def init(self, key):
        return self.heads.init(key)

    def boundary_from_data(self, y: jnp.ndarray):
        """Edge values in IV_LIST order (reference training_step :66-74)."""
        t0 = y[0, 0:-1].reshape(-1)
        x0 = y[1:, 0].reshape(-1)
        tn = y[-1, 1:-1].reshape(-1)
        xn = y[:, -1].reshape(-1)
        return jnp.concatenate([t0, x0, tn, xn])[None, :]

    def forward(self, params, y):
        coeffs_c, rhs = self.heads.apply(params)
        coeffs = jnp.broadcast_to(
            coeffs_c[:, None, :], (1, self.layer.grid_size, self.layer.n_orders)
        )
        iv_rhs = self.boundary_from_data(y)
        u0, u, _ = self.layer(coeffs, rhs, iv_rhs, list(self.steps))
        return u0.reshape(self.cfg.coord_dims), coeffs_c, u

    def loss_fn(self, params, y):
        u0, coeffs_c, _ = self.forward(params, y)
        loss = jnp.mean((u0 - y) ** 2)
        return loss, {"u0": u0}


def train(cfg: Optional[SineFitConfig] = None, log=None):
    cfg = cfg or SineFitConfig()
    log_dir, run_id = rundir.create_log_dir(root="logs/sine_fit", reuse=False)
    log = log or logging_util.setup(log_dir, name="sine_fit")
    log.info(f"Sine PDE fit, grid {cfg.coord_dims}")

    model = SineFit(cfg)
    y = jnp.asarray(damped_sine(cfg.coord_dims))
    params = model.init(jax.random.PRNGKey(cfg.seed))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    update = make_update(model.loss_fn, optimizer)

    history = []
    for epoch in range(cfg.epochs):
        params, opt_state, loss, aux = update(params, opt_state, y)
        history.append(float(loss))
        if epoch % 10 == 0 or epoch == cfg.epochs - 1:
            log.info(f"epoch {epoch} train_loss {float(loss):.4E}")
    return params, model, history


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    train()

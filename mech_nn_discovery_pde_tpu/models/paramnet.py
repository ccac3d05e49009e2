"""ParamNet: learned-input MLP emitting PDE basis coefficients.

Parity with the reference discovery scripts' inner ParamNet modules
(burgers_dparam_viscous.py:189-207, ginzburg_landau.py:256-269,
kamani.py:171-184): a trainable 512-vector fed through a ReLU MLP producing
n_out coefficients.  Depth differs per script (3 hidden layers for Burgers, 2
for GL/Kamani); `depth` covers both."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ParamNet(nn.Module):
    n_out: int
    width: int = 1024
    in_dim: int = 512
    depth: int = 2

    @nn.compact
    def __call__(self):
        x = self.param(
            "input", nn.initializers.normal(1.0), (1, self.in_dim), jnp.float32
        )
        for _ in range(self.depth):
            x = nn.relu(nn.Dense(self.width)(x))
        return nn.Dense(self.n_out)(x)

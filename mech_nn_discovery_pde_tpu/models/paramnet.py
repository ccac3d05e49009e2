"""ParamNet: learned-input MLP emitting PDE basis coefficients.

Parity with the reference discovery scripts' inner ParamNet modules
(burgers_dparam_viscous.py:189-207, ginzburg_landau.py:256-269,
kamani.py:171-184): a trainable 512-vector fed through a ReLU MLP producing
n_out coefficients.  Depth differs per script (3 hidden layers for Burgers, 2
for GL/Kamani); `depth` covers both.

`torch_init` reproduces torch.nn.Linear's default initialization (weight
kaiming-uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in)), bias
uniform(+-1/sqrt(fan_in))) instead of flax's lecun_normal/zeros — used by the
Kamani basin-escape study to control for init-distribution differences."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_inits(fan_in: int):
    """(kernel_init, bias_init) matching torch.nn.Linear defaults."""
    kinit = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    bound = 1.0 / np.sqrt(fan_in)

    def binit(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kinit, binit


class ParamNet(nn.Module):
    n_out: int
    width: int = 1024
    in_dim: int = 512
    depth: int = 2
    param_dtype: Any = jnp.float32
    torch_init: bool = False
    # zero_out_init starts the output head at exactly 0 (coefficients begin
    # at the origin — the entrance of the monotone-descent corridor found by
    # benchmarks/kamani_basin_mechanism.py); out_scale multiplies the head
    # output so O(1) net movement can reach O(out_scale) coefficients
    # (Kamani's true rows are O(100) while Adam moves outputs O(lr)/step).
    # Both are documented deviations from the reference init (kamani.py
    # :171-184); defaults preserve reference behavior.
    zero_out_init: bool = False
    out_scale: float = 1.0

    @nn.compact
    def __call__(self):
        x = self.param(
            "input", nn.initializers.normal(1.0), (1, self.in_dim), self.param_dtype
        )
        for _ in range(self.depth):
            kw = {}
            if self.torch_init:
                k, b = torch_linear_inits(x.shape[-1])
                kw = dict(kernel_init=k, bias_init=b)
            x = nn.relu(nn.Dense(self.width, param_dtype=self.param_dtype, **kw)(x))
        kw = {}
        if self.torch_init:
            k, b = torch_linear_inits(x.shape[-1])
            kw = dict(kernel_init=k, bias_init=b)
        if self.zero_out_init:
            kw = dict(kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros)
        out = nn.Dense(self.n_out, param_dtype=self.param_dtype, **kw)(x)
        return self.out_scale * out

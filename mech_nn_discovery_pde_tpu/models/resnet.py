"""Learned denoising transforms: convolutional ResNets in flax.

Parity with reference discovery/net.py: a plain 2D ResNet (12 residual 5x5
conv layers at 128 channels, net.py:6-34), and 1/2/3D ResNet variants with
pointwise lift/project layers (net.py:60-211, widths 100/100/64).  These are
applied to raw observations u -> u' before basis construction and boundary
extraction in the discovery models.

Layouts are channels-last (NHWC / NDHWC) — the TPU-native convolution layout.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mech_nn_discovery_pde_tpu.models.paramnet import torch_linear_inits


def _layer_kwargs(param_dtype, torch_init: bool, fan_in: int):
    kw: dict = {"param_dtype": param_dtype}
    if torch_init:
        k, b = torch_linear_inits(fan_in)
        kw.update(kernel_init=k, bias_init=b)
    return kw


class ResNet(nn.Module):
    """2D conv ResNet (reference ResNet, net.py:6-34): 5x5 convs, residual
    connections between consecutive layers, ReLU.

    Input (bs, H, W, in_channels) -> (bs, H, W, out_channels)."""

    out_channels: int = 1
    in_channels: int = 1
    width: int = 128
    depth: int = 12

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.width, (5, 5), padding="SAME")(x)
        prev = x
        x = nn.relu(x)
        for _ in range(self.depth):
            x = nn.Conv(self.width, (5, 5), padding="SAME")(x) + prev
            prev = x
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (5, 5), padding="SAME")(x)


class _ResBlock(nn.Module):
    """Conv + 1x1-shortcut residual block (reference Resnet{1,2,3}dBlock)."""

    width: int
    ndim: int
    circular: bool = False
    activation: bool = True
    param_dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x):
        pad = "CIRCULAR" if self.circular else "SAME"
        k = (5,) * self.ndim
        kw5 = _layer_kwargs(self.param_dtype, self.torch_init,
                            x.shape[-1] * 5**self.ndim)
        kw1 = _layer_kwargs(self.param_dtype, self.torch_init, x.shape[-1])
        out = nn.Conv(self.width, k, padding=pad, **kw5)(x)
        out = out + nn.Conv(self.width, (1,) * self.ndim, padding=pad, **kw1)(x)
        if self.activation:
            out = nn.relu(out)
        return out


class _ResNetND(nn.Module):
    """Pointwise lift -> residual conv stack -> pointwise head (reference
    ResNet1D/2D/3D: fc0 -> blocks -> fc1 -> relu -> fc2)."""

    ndim: int
    out_channels: int = 1
    width: int = 100
    depth: int = 9
    circular: bool = False
    param_dtype: Any = jnp.float32
    torch_init: bool = False

    @nn.compact
    def __call__(self, x):
        kw = lambda fi: _layer_kwargs(self.param_dtype, self.torch_init, fi)
        x = nn.Dense(self.width, **kw(x.shape[-1]))(x)
        for _ in range(self.depth):
            x = _ResBlock(self.width, self.ndim, circular=self.circular,
                          param_dtype=self.param_dtype,
                          torch_init=self.torch_init)(x)
        x = nn.Dense(128, **kw(x.shape[-1]))(x)
        x = nn.relu(x)
        return nn.Dense(self.out_channels, **kw(x.shape[-1]))(x)


def ResNet1D(out_channels: int = 1, in_channels: int = 1, width: int = 100,
             depth: int = 9, **kw) -> _ResNetND:
    """(bs, L, C) -> (bs, L, out_channels); circular padding (net.py:36-95).
    `in_channels` is accepted for API parity (the lift layer adapts)."""
    return _ResNetND(ndim=1, out_channels=out_channels, width=width,
                     depth=depth, circular=True, **kw)


def ResNet2D(out_channels: int = 1, in_channels: int = 1, width: int = 100,
             depth: int = 9, **kw) -> _ResNetND:
    """(bs, H, W, C) -> (bs, H, W, out_channels) (net.py:97-155)."""
    return _ResNetND(ndim=2, out_channels=out_channels, width=width,
                     depth=depth, **kw)


def ResNet3D(out_channels: int = 1, in_channels: int = 1, width: int = 64,
             depth: int = 7, **kw) -> _ResNetND:
    """(bs, D, H, W, C) -> (bs, D, H, W, out_channels) (net.py:157-211)."""
    return _ResNetND(ndim=3, out_channels=out_channels, width=width,
                     depth=depth, **kw)

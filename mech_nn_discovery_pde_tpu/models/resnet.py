"""Learned denoising transforms: convolutional ResNets in flax.

Parity with reference discovery/net.py: a plain 2D ResNet (12 residual 5x5
conv layers at 128 channels, net.py:6-34), and 1/2/3D ResNet variants with
pointwise lift/project layers (net.py:60-211, widths 100/100/64).  These are
applied to raw observations u -> u' before basis construction and boundary
extraction in the discovery models.

Layouts are channels-last (NHWC / NDHWC) — the TPU-native convolution layout.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


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

    @nn.compact
    def __call__(self, x):
        pad = "CIRCULAR" if self.circular else "SAME"
        k = (5,) * self.ndim
        out = nn.Conv(self.width, k, padding=pad)(x)
        out = out + nn.Conv(self.width, (1,) * self.ndim, padding=pad)(x)
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

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width)(x)
        for _ in range(self.depth):
            x = _ResBlock(self.width, self.ndim, circular=self.circular)(x)
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_channels)(x)


def ResNet1D(out_channels: int = 1, in_channels: int = 1, width: int = 100,
             depth: int = 9, **kw) -> _ResNetND:
    """(bs, L, C) -> (bs, L, out_channels); circular padding (net.py:36-95).
    `in_channels` is accepted for API parity (the lift layer adapts)."""
    return _ResNetND(ndim=1, out_channels=out_channels, width=width,
                     depth=depth, circular=True)


def ResNet2D(out_channels: int = 1, in_channels: int = 1, width: int = 100,
             depth: int = 9, **kw) -> _ResNetND:
    """(bs, H, W, C) -> (bs, H, W, out_channels) (net.py:97-155)."""
    return _ResNetND(ndim=2, out_channels=out_channels, width=width, depth=depth)


def ResNet3D(out_channels: int = 1, in_channels: int = 1, width: int = 64,
             depth: int = 7, **kw) -> _ResNetND:
    """(bs, D, H, W, C) -> (bs, D, H, W, out_channels) (net.py:157-211)."""
    return _ResNetND(ndim=3, out_channels=out_channels, width=width, depth=depth)

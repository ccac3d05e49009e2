"""Shared discovery-training utilities: step parameterization, optimizer
setup, jitted training-step factory."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.special import logit


def fixed_steps(step_size: float, bs: int, dim: int, lo: float = None, hi: float = None):
    """Reference step parameterization: sigmoid(logit(h)) expanded over the
    grid, optionally clipped (e.g. burgers...:248-252).  Steps are buffers in
    the reference (not trained) — returned as a plain array."""
    s = 1.0 / (1.0 + np.exp(-logit(step_size)))
    if lo is not None:
        s = np.clip(s, lo, hi)
    return jnp.full((bs, dim - 1), s, dtype=jnp.float64)


def make_update(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """Jitted (params, opt_state, *batch) -> (params, opt_state, aux)."""

    @jax.jit
    def update(params, opt_state, *batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, *batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return update

"""Shared discovery-training utilities: step parameterization, optimizer
setup, jitted training-step factory."""

from __future__ import annotations

from typing import Any, Callable

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


class TrainHarness:
    """Checkpoint/resume + phase timing for the discovery training loops
    (SURVEY 5.1/5.4: the reference has neither; its recovery story is logs
    only and long runs on a worker that can fault need better).

    Usage:
        harness = TrainHarness(log_dir, params, opt_state, log=log)
        params, opt_state = harness.params, harness.opt_state
        for epoch in range(harness.start_epoch, cfg.epochs):
            with harness.timer.phase("update"):
                ...train steps...
            harness.end_epoch(epoch, params, opt_state)
    """

    def __init__(
        self,
        log_dir: str,
        params: Any,
        opt_state: Any,
        resume: bool = True,
        ckpt_every: int = 25,
        log=None,
    ):
        from mech_nn_discovery_pde_tpu.utils.checkpoint import Checkpointer
        from mech_nn_discovery_pde_tpu.utils.profiling import PhaseTimer

        self.ckpt = Checkpointer(log_dir)
        self.ckpt_every = ckpt_every
        self.timer = PhaseTimer()
        self.log = log
        self.params, self.opt_state = params, opt_state
        self.start_epoch = 0
        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                restored = self.ckpt.restore(
                    {"params": params, "opt_state": opt_state}, step=latest
                )
                self.params = restored["params"]
                self.opt_state = restored["opt_state"]
                self.start_epoch = latest + 1
                if log:
                    log.info(f"resumed from checkpoint at epoch {latest}")

    def end_epoch(self, epoch: int, params: Any, opt_state: Any) -> None:
        if self.ckpt_every and (epoch + 1) % self.ckpt_every == 0:
            with self.timer.phase("checkpoint"):
                self.ckpt.save(epoch, {"params": params, "opt_state": opt_state})
            if self.log:
                self.log.info("phase timings:\n" + self.timer.report())

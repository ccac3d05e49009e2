"""Checkpoint/resume via orbax (new subsystem; the reference has none —
SURVEY 5.4: recovery story was logs only).

Saves pytrees of (params, opt_state, step) under <run_dir>/ckpt and restores
the latest on demand."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, run_dir: str, max_to_keep: int = 3):
        path = os.path.abspath(os.path.join(run_dir, "ckpt"))
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

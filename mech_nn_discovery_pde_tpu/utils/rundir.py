"""Run directories + source provenance (reference extras/source.py:7-49).

create_log_dir picks the first free integer directory under the experiment
root; write_source_files snapshots `git diff` and the commit hash into the
run dir for experiment provenance."""

from __future__ import annotations

import os
import subprocess
from typing import Optional, Tuple

_log_dir: Optional[str] = None
_run_id: Optional[int] = None


def create_log_dir(root: str = "logs/misc", reuse: bool = True) -> Tuple[str, int]:
    global _log_dir, _run_id
    if reuse and _log_dir is not None:
        return _log_dir, _run_id
    for i in range(100000):
        path = os.path.join(root, str(i))
        if not os.path.isdir(path):
            os.makedirs(path)
            _log_dir, _run_id = path, i
            return path, i
    raise RuntimeError("run-dir limit exceeded")


def write_source_files(run_dir: str) -> None:
    os.makedirs(run_dir, exist_ok=True)
    diff = os.path.join(run_dir, "git.diff")
    if not os.path.isfile(diff):
        with open(diff, "w") as fd:
            subprocess.call(["git diff -- '*.py'"], stdout=fd, stderr=fd, shell=True)
    commit = os.path.join(run_dir, "commit.txt")
    if not os.path.isfile(commit):
        with open(commit, "w") as fd:
            subprocess.call(["git rev-parse HEAD"], stdout=fd, stderr=fd, shell=True)

"""Kamani basin-escape probe battery (round-3 study).

Round-2 finding: with the reference recipe (Adam lr 5e-6, L1 0.01, f32_ir
solves, seed 10) training locks into a "lazy" basin within ~100 epochs —
p0 (the sigma_t coefficient row) grows large and NEGATIVE, which squashes
du0/d(p1,p2) ~ 1/|p0| below the 0.01 L1 pressure, so the p1 row is pinned
at exactly 0 and loss plateaus at ~8.0 (truth reaches ~1.4, dominated by
its own L1 term).  The reference (torch, all-f64, unseeded) reports
convergence, so the escape is decided by init/early dynamics and possibly
by gradient fidelity through the solver.

Each probe runs the standard training loop (discovery/kamani.py) for a
short budget with one controlled variation; the basin is identifiable by
epoch ~300 (p1row == 0 & p0row < 0 => stuck).  Runs serialize on the TPU
(worker crashes under concurrent load) and are resumable.

Usage:
    python benchmarks/kamani_probes.py            # run all probes
    python benchmarks/kamani_probes.py s0 f64_s10 # run selected
    python benchmarks/kamani_probes.py --report   # summarize results
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 300

# name -> KamaniConfig overrides
PROBES = {
    # seed sweep, baseline recipe
    "s0": dict(seed=0),
    "s1": dict(seed=1),
    "s2": dict(seed=2),
    # f64 solver precision (reference parity: torch path is all-f64);
    # tests whether the escape gradient drowns in f32_ir solver noise
    "f64_s10": dict(seed=10, precision="f64"),
    "f64_s0": dict(seed=0, precision="f64"),
    # full reference-faithful precision: f64 nets AND f64 solves
    "f64nets_s10": dict(seed=10, precision="f64", net_dtype="f64"),
    # 4x learning rate
    "lr4x_s10": dict(seed=10, lr=2e-5),
    # torch Linear/Conv init distribution (nonzero uniform biases) — the
    # reference script is UNSEEDED torch, so its init distribution (not any
    # one seed) is the faithful object; sample several draws
    "torchinit_s10": dict(seed=10, torch_init=True),
    "torchinit_s0": dict(seed=0, torch_init=True),
    "torchinit_s1": dict(seed=1, torch_init=True),
    "torchinit_s2": dict(seed=2, torch_init=True),
    # documented-deviation ladder (only if the faithful protocol fails
    # across init draws): larger lr fights the early L1 pinning of the
    # sigma_t row (du0/dp1 ~ 1/|p0| shrinks as |p0| grows, CLAUDE.md)
    "torchinit_lr4x_s0": dict(seed=0, torch_init=True, lr=2e-5),
    "torchinit_lr4x_s10": dict(seed=10, torch_init=True, lr=2e-5),
}


def run_probe(name: str, overrides: dict, epochs: int = EPOCHS,
              max_retries: int = 6):
    """One probe, babysat: the axon TPU worker crashes (UNAVAILABLE) under
    sustained load and recovers in ~5-6 min; training checkpoints every 50
    epochs and resumes across retries."""
    import time

    import jax

    jax.config.update("jax_enable_x64", True)
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.discovery.kamani import KamaniConfig, train

    overrides = dict(overrides)
    precision = overrides.pop("precision", "f32_ir")
    log_dir = f"logs/probes/kamani_{name}"
    os.makedirs(log_dir, exist_ok=True)
    cfg = KamaniConfig(
        epochs=epochs,
        plot_every=0,
        ckpt_every=50,
        resume_from=log_dir,
        pde=PDEConfig(precision=precision, log_solves=False),
        **overrides,
    )
    print(f"=== probe {name}: {overrides} precision={precision} ===", flush=True)
    for attempt in range(max_retries):
        try:
            train(cfg)
            return
        except Exception as e:  # worker crash / transient dispatch failure
            print(f"probe {name} attempt {attempt}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            time.sleep(360)
    print(f"probe {name}: giving up after {max_retries} attempts", flush=True)


def report():
    import glob

    rows = []
    logs = {name: f"logs/probes/kamani_{name}/log.txt" for name in PROBES}
    for p in sorted(glob.glob("logs/kamani_final_*/log.txt")):
        logs[os.path.basename(os.path.dirname(p))] = p
    for name, log in logs.items():
        if not os.path.exists(log):
            continue
        txt = open(log).read()
        pb = re.findall(r"- param (\[\[.*?\]\])\nexps (\[\[.*?\]\])", txt, re.S)
        losses = re.findall(r"epoch (\d+), loss ([\dE+-.naif]+)", txt)
        if not pb or not losses:
            continue
        nums = lambda s: np.array(
            [float(x) for x in re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", s)]
        )
        pr = nums(pb[-1][0]).reshape(4, 3)
        er = nums(pb[-1][1]).reshape(4, 2)
        ep, loss = int(losses[-1][0]), float(losses[-1][1])
        p1mag = float(np.abs(pr[1]).sum())
        stuck = p1mag < 0.05 and pr[0].sum() < 0
        rows.append(
            dict(name=name, epoch=ep, loss=loss, p0row=pr[0].round(3).tolist(),
                 p1mag=round(p1mag, 3), e0=er[0].round(2).tolist(), stuck=bool(stuck))
        )
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    if "--report" in args:
        report()
        sys.exit(0)
    names = args or list(PROBES)
    for n in names:
        run_probe(n, PROBES[n])
    report()

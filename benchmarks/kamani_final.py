"""Kamani full-criterion training run (5000 epochs, reference protocol)
with crash-babysitting — launch with the winning configuration from the
round-3 basin-escape probe battery (benchmarks/kamani_probes.py).

Usage:
    python benchmarks/kamani_final.py <run_name> [key=value ...]
e.g.
    python benchmarks/kamani_final.py s0 seed=0
    python benchmarks/kamani_final.py f64_s0 seed=0 precision=f64 lr=2e-5
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    overrides = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        overrides[k] = v

    import jax

    jax.config.update("jax_enable_x64", True)
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.discovery.kamani import KamaniConfig, train

    precision = overrides.pop("precision", "f32_ir")
    seed = int(overrides.pop("seed", 10))
    lr = float(overrides.pop("lr", 5e-6))
    epochs = int(overrides.pop("epochs", 5000))
    net_dtype = overrides.pop("net_dtype", "f32")
    torch_init = overrides.pop("torch_init", "0") == "1"
    # in-band stats default OFF here: the axon worker crashed 3x in a row
    # compiling the stats-enabled Kamani graph on 2026-08-17 while the
    # stats-free graph (this morning's probes) ran for hours
    stats = overrides.pop("stats", "0") == "1"
    assert not overrides, f"unknown overrides {overrides}"

    log_dir = f"logs/kamani_final_{name}"
    os.makedirs(log_dir, exist_ok=True)
    cfg = KamaniConfig(
        epochs=epochs, seed=seed, lr=lr, net_dtype=net_dtype,
        torch_init=torch_init, plot_every=250, ckpt_every=50,
        resume_from=log_dir,
        pde=PDEConfig(precision=precision, log_solves=False,
                      return_solve_stats=stats),
    )
    print(f"=== kamani final {name}: seed={seed} lr={lr} precision={precision} "
          f"net_dtype={net_dtype} torch_init={torch_init} ===", flush=True)

    def worker_healthy():
        """Trivial op probe: don't hammer a still-cycling worker with the
        heavy graph — fast-failed attempts prolong the crash loop."""
        try:
            import jax.numpy as jnp

            x = jnp.ones((64, 64))
            float((x @ x).sum())
            return True
        except Exception:
            return False

    for attempt in range(40):  # long run; worker faults recover in ~5-10 min
        try:
            while not worker_healthy():
                print("worker unhealthy; waiting 120 s", flush=True)
                time.sleep(120)
            train(cfg)
            print("kamani final run COMPLETE", flush=True)
            return
        except Exception as e:
            print(f"attempt {attempt}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            time.sleep(600)
    print("kamani final: giving up", flush=True)


if __name__ == "__main__":
    main()

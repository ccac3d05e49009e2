"""GL workload-config corners (VERDICT r2 next-#8): second equation
(first_equation=False) and nn_transform=True runs, babysat + resumable.

Usage:
    python benchmarks/gl_stretch.py veq   [epochs]
    python benchmarks/gl_stretch.py nnt   [epochs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.discovery.ginzburg_landau import (
        GLConfig, train,
    )

    opts = dict(
        veq=dict(first_equation=False),
        nnt=dict(nn_transform=True),
        # bf16 stored preconditioner on the standard first-equation run:
        # the end-to-end recovery check gating a default flip of
        # config.mg_precond_dtype
        bf16=dict(),
    )[which]
    log_dir = f"logs/gl_stretch_{which}"
    os.makedirs(log_dir, exist_ok=True)
    cfg = GLConfig(
        epochs=epochs, resume_from=log_dir, ckpt_every=10,
        pde=PDEConfig(precision="f32_ir", mg_solve_dtype="f32",
                      mg_precond_dtype="bf16" if which == "bf16" else "f32",
                      log_solves=False, return_solve_stats=True),
        **opts,
    )
    print(f"=== GL stretch {which}: {opts} epochs={epochs} ===", flush=True)
    for attempt in range(20):
        try:
            train(cfg)
            print(f"GL stretch {which} COMPLETE", flush=True)
            return
        except Exception as e:
            print(f"attempt {attempt}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            time.sleep(360)


if __name__ == "__main__":
    main()

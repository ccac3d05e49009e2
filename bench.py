"""Headline benchmark: the flagship Ginzburg-Landau multigrid training step.

Measures the full training-relevant iteration of the reference's GL sparse
workload (solver_dim (8, 32, 32), n_grid 3, bs 32 -> 1.83M unknowns per
batch; discovery/ginzburg_landau.py:52-57): constraint fill, coarse-hierarchy
build, FGMRES(10x40)+V-cycle forward solve, and the IFT backward solve at the
reference's separate backward budget — i.e. KKT solves/sec through the
MultigridLayer.  Also measures the dense Burgers path (round-1 headline) and
reports it under "extras".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.

vs_baseline (documented model, the repo publishes no numbers —
BASELINE.json published:{}): the reference's GL step on A100 runs 40 forward
+ 40 backward FGMRES iterations, each applying one V-cycle with 5+5
Gauss-Seidel sweeps per level via CuPy CSR spsolve_triangular
(solver/multigrid.py:399-498, config.py:14-24).  AtA for this system has
~19M nonzeros batch-wide across ~1.3x level overhead; a GS sweep is one
lower+upper triangular solve = ~2 passes over nnz (~460 MB).  The cost is
dominated by the level-scheduled sparse triangular solves, whose achieved
bandwidth on unstructured CSR spans roughly 100% (impossible best case:
0.5 s/step = 64 solves/s) down to ~3% (wavefront-bound worst case:
~17 s/step = 1.9 solves/s), plus ~1000 host-driven kernel launches per
step.  The denominator is the geometric midpoint of that band,
8 s/step -> 4.0 KKT solves/sec, with the full range [1.9, 64] documented
here; vs_baseline therefore carries a ~4x model uncertainty in either
direction and should be read together with extras.gl_step_seconds.
"""

import json
import os
import time

# Last-known-good result cache: the axon tunnel has hours-long outages
# (round 3 ended during one and recorded value=0.0, BENCH_r03.json).  Every
# successful run refreshes this committed file; on an unreachable backend the
# watchdog emits the cached measurement CLEARLY LABELED as stale in extras
# instead of a meaningless zero.
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_CACHE.json")


def _git_head() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return ""


def _emit_stale(error: str) -> None:
    """Emit the last-known-good measurement, clearly marked TOP-LEVEL as
    stale (ADVICE r4: consumers reading only the headline fields must not
    attribute cached performance to HEAD).  If the cache was recorded at a
    DIFFERENT commit than HEAD, the headline value is zeroed and the cached
    numbers are demoted to extras — old-code performance is never presented
    as the current commit's."""
    try:
        with open(CACHE_PATH) as f:
            cached = json.load(f)
        cached["stale"] = True
        cached.setdefault("extras", {})
        cached["extras"]["stale"] = True
        cached["extras"]["error"] = error
        head = _git_head()
        cache_commit = cached.get("git_commit", "")
        if head and cache_commit and head != cache_commit:
            cached["extras"]["stale_cached_value"] = cached.get("value", 0.0)
            cached["extras"]["stale_cached_commit"] = cache_commit
            cached["value"] = 0.0
            cached["vs_baseline"] = 0.0
        print(json.dumps(cached), flush=True)
    except Exception:
        print(json.dumps({
            "metric": "gl_multigrid_kkt_fwd_bwd_solves_per_sec",
            "value": 0.0,
            "unit": "KKT solves/sec (bs=32, (8,32,32) n_grid=3)",
            "vs_baseline": 0.0,
            "stale": True,
            "extras": {"error": error},
        }), flush=True)


def _bench_gl(jax, jnp, np, extend_deadline=lambda s: None):
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.multigrid import MultigridLayer

    bs, dims, ng = 32, (8, 32, 32), 3
    ivs = [
        lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1]),
        lambda nt, nx, ny: (1, 0, [1, 0, 0], [nt - 1, 0, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, 0], [nt - 1, nx - 1, 0]),
        lambda nt, nx, ny: (1, 0, [1, nx - 1, 1], [nt - 1, nx - 1, ny - 1]),
        lambda nt, nx, ny: (2, 0, [1, 1, ny - 1], [nt - 1, nx - 2, ny - 1]),
    ]
    # Production config "b30c4rm" (round-5 smoother-budget study): Chebyshev
    # 4+4 smoothing at FGMRES 30 fwd / 30 bwd with V-cycle residual reuse
    # and the fused Krylov matvec.  Quality-grounded on the BENCH PROBLEM
    # ITSELF (benchmarks/smoother_budget_tpu.py, TPU): fwd relres@30 =
    # 1.25e-3, i.e. 2.5x BETTER than the reference's own GS 5+5 @40 bar of
    # 3.1e-3 (faithful scipy replication, benchmarks/ref_gs_replication.py).
    # Same-session full-step A/B (benchmarks/gl_step_decomp.py, 2026-08-19):
    # b30rm 7.50 s -> b35c4rm 6.21 s (cheb4+4@35, relres 4.13e-4, BETTER
    # than b30rm's 4.54e-4) -> b30c4rm 4.97 s (1.51x).  Background: the
    # cheb3 decomp showed the smoother is ~90% of the step, and the quality
    # battery showed cheb4+4 is past the strength knee (its relres floor is
    # 4.13e-4 vs cheb3+3's 1.77e-3), so trading smoother sweeps for Krylov
    # iterations wins at fixed quality.
    # NOTE on budget granularity: the FGMRES driver advances in
    # restart-window units (solvers/krylov.py `it += restart` with
    # window=10), so maxiter only matters in steps of 10 here — a "b25"
    # config runs the identical 3 windows as b30 (verified: relres matches
    # to 4 digits, 1.249e-3).  The next real notch down is 20 iterations
    # (b20c4rm), gated on the same 3.1e-3 reference bar.
    layer = MultigridLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=ivs, solver_dbl=True, n_grid=ng,
        downsample_first=False,
        config=PDEConfig(
            precision="f32_ir", mg_solve_dtype="f32",
            mg_smoother_steps_pre=4, mg_smoother_steps_post=4,
            mg_fgmres_max_iter_forward=30, mg_fgmres_max_iter_backward=30,
            mg_smoother_residual=True, mg_fused_matvec=True,
        ),
    )
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 0] = -1.0
    coeffs[..., 1] = 1.0
    coeffs[..., 5] = -1.0
    coeffs[..., 6] = -1.0
    rhs = 0.01 * rng.standard_normal((bs, layer.grid_size))
    iv = 0.1 * rng.standard_normal((bs, layer.system.n_init_rows))
    steps = [jnp.asarray(np.full((bs, d - 1), 0.1)) for d in dims]
    c0, r0, i0 = (jnp.asarray(a) for a in (coeffs, rhs, iv))

    def fwd_bwd(c, r, i):
        def loss(c, r, i):
            u0, _, _ = layer(c, r, i, steps)
            return jnp.sum(u0**2)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(c, r, i)

    step = jax.jit(fwd_bwd)
    out = step(c0, r0, i0)
    jax.block_until_ready(out)
    # warmup compile done — the remaining phases are dispatch-scale; shrink
    # the watchdog budget so a post-compile worker hang is caught quickly
    # (ADVICE r4: one global deadline starting pre-compile could fire during
    # a legitimate cold 20-40 min AOT compile)
    extend_deadline(900)
    # >=5 separately-timed dispatches with representable input perturbations
    # (f64 inputs: 1e-6 changes bits, defeats per-input result caching, and
    # is far below any convergence-relevant scale); median + spread reported
    # because the tunnel worker's throughput drifts up to ~65% in-session
    ts = []
    for k in range(5):
        t0 = time.perf_counter()
        out = step(c0 + 1e-6 * (k + 1), r0, i0)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    dt = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / dt
    roofline = _gl_roofline(jax, jnp, np, layer, c0, r0, i0, steps, dt)
    return bs / dt, dt, spread, roofline


# v5e HBM bandwidth (public spec: ~819 GB/s per chip)
HBM_BYTES_PER_SEC = 819e9


def _gl_roofline(jax, jnp, np, layer, c0, r0, i0, steps, step_seconds):
    """Self-grounding roofline for the headline claim (VERDICT r2 weak #2):

    (a) measure the achieved bandwidth of the batched fine-level stencil
        apply (the V-cycle's inner loop) via a 100-apply chain in ONE jit —
        the only microbenchmark shape the tunnel reports faithfully;
    (b) count the step's minimum HBM traffic from the iteration structure
        (applies are counted; coef fields re-read every apply) and report
        measured-step-time / bandwidth-bound-time.
    """
    import time as _time

    mg = layer.mg_solver
    cfg = layer.config
    sys0 = mg.systems[0]
    desc, build, apply_ = mg._nstencil[0]
    from mech_nn_discovery_pde_tpu.ops.structured import split_values

    bs = c0.shape[0]
    values = sys0.fill_values(
        c0.reshape(bs, layer.grid_size, layer.n_orders).astype(jnp.float32),
        [s.astype(jnp.float32) for s in steps],
        dtype=jnp.float32,
    )
    coef = jax.vmap(lambda v: build(split_values(sys0.spec, v)))(values)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((bs, sys0.num_vars)), jnp.float32
    )

    n_chain = 100

    @jax.jit
    def chain(coef, x):
        def body(_, y):
            y = jax.vmap(apply_)(coef, y)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)

        return jax.lax.fori_loop(0, n_chain, body, x)

    out = chain(coef, x)
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    out = chain(coef, x + 1e-3)
    jax.block_until_ready(out)
    apply_dt = (_time.perf_counter() - t0) / n_chain

    NC, N, m = desc.n_channels, desc.grid_size, desc.n_mi
    apply_bytes = bs * 4 * (NC * N + 2 * m * N)  # read coef+x, write y
    apply_gbs = apply_bytes / apply_dt / 1e9
    apply_bw_fraction = apply_bytes / apply_dt / HBM_BYTES_PER_SEC

    # ---- exact minimum-traffic model of the whole fwd+bwd step ----
    # VERDICT r4 weak #2: the dominant stored-operator term is the line-block
    # inverse read (GL fine level: 1024 lines x 56^2 x 4 B ~ 12.8 MB/sample,
    # ~411 MB per batched block apply) — ~19x the vector traffic the old
    # model counted.  Sum per-level bytes exactly from the hierarchy
    # descriptors instead of a 0.25^k approximation.  bf16_factored note:
    # the factored apply z = W (W^T r) reads the half-width W TWICE (two
    # einsums), so its XLA-path traffic equals f32 direct — the byte win is
    # only realized by the VMEM-resident fused kernel.
    binv_sz = jnp.dtype(mg.binv_dtype).itemsize
    binv_passes = 2 if getattr(mg, "_factored_binv", False) else 1
    pre_post = cfg.mg_smoother_steps_pre + cfg.mg_smoother_steps_post
    lvl_bytes = []  # (stencil_apply_bytes, block_apply_bytes) per level
    for k in range(mg.n_grid):
        dk = mg._nstencil[k][0]
        nt_k = mg.dim_list[k][0]
        n_lines = dk.grid_size // nt_k
        blk = nt_k * dk.n_mi
        a_k = bs * 4 * (dk.n_channels * dk.grid_size + 2 * dk.n_mi * dk.grid_size)
        b_k = bs * (binv_passes * n_lines * blk * blk * binv_sz
                    + 4 * 2 * dk.n_mi * dk.grid_size)
        lvl_bytes.append((a_k, b_k))

    # per V-cycle: each Chebyshev step on levels 0..n-2 = 1 stencil apply +
    # 1 block apply; + 1 residual apply per level unless the recurrence
    # residual is reused; coarsest level = one batched dense matvec reading
    # coarse_inv.
    nc = mg.systems[-1].num_vars
    coarse_bytes = bs * nc * nc * jnp.dtype(mg.vdtype).itemsize
    vcycle_bytes = coarse_bytes + sum(
        pre_post * (a_k + b_k) + (0 if cfg.mg_smoother_residual else a_k)
        for a_k, b_k in lvl_bytes[:-1]
    )
    iters = cfg.mg_fgmres_max_iter_forward + cfg.mg_fgmres_max_iter_backward
    # fine solve-dtype matvec per Krylov iteration unless fused into the
    # post-smoother's residual invariant
    fine_mv = 0 if cfg.mg_fused_matvec else lvl_bytes[0][0]
    # one-time per step: lmax power iteration (20 applies + block applies
    # per smoothed level) during the hierarchy build, shared fwd/bwd
    power_bytes = 20 * sum(a_k + b_k for a_k, b_k in lvl_bytes[:-1])
    step_min_bytes = iters * (fine_mv + vcycle_bytes) + power_bytes
    bound_seconds = step_min_bytes / HBM_BYTES_PER_SEC
    return {
        "stencil_apply_ms": round(apply_dt * 1e3, 3),
        "stencil_apply_gb_per_s": round(apply_gbs, 1),
        "stencil_apply_bw_fraction": round(apply_bw_fraction, 4),
        "step_bw_bound_seconds": round(bound_seconds, 3),
        "step_bw_fraction": round(bound_seconds / step_seconds, 4),
    }


def _bench_dense(jax, jnp, np):
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    bs, dims = 10, (32, 32)
    iv_list = [
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 2]),
        lambda nx, ny: (1, 0, [1, 0], [nx - 1, 0]),
        lambda nx, ny: (1, 0, [0, ny - 1], [nx - 1, ny - 1]),
    ]
    layer = PDEDenseLayer(
        bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
        init_index_mi_list=iv_list, solver_dbl=True,
        config=PDEConfig(precision="f32_ir"),
    )
    rng = np.random.default_rng(0)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 0.5
    coeffs[..., 4] = 0.1
    rhs = 0.01 * rng.standard_normal((bs, layer.grid_size))
    iv = 0.1 * rng.standard_normal((bs, 31 + 31 + 32))
    steps = [
        jnp.asarray(np.full((bs, 31), 0.025)),
        jnp.asarray(np.full((bs, 31), 0.078)),
    ]
    c0, r0, i0 = (jnp.asarray(a) for a in (coeffs, rhs, iv))

    def fwd_bwd(c, r, i):
        def loss(c, r, i):
            u0, u, _ = layer(c, r, i, steps)
            return jnp.sum(u0**2)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(c, r, i)

    step = jax.jit(fwd_bwd)
    out = step(c0, r0, i0)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for k in range(n):
        out = step(c0 + 1e-12 * k, r0, i0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return bs / dt


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: the GL fwd+bwd graph takes minutes to compile
    # through the TPU tunnel; cache serialized executables across runs
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    # Watchdog: the axon tunnel can be DOWN (hours-long outage observed
    # 2026-08-17); jax.devices() then blocks forever.  Emit a well-formed
    # JSON line and exit rather than hanging the driver.
    import threading

    ready = threading.Event()

    def _watchdog():
        if not ready.wait(600):
            _emit_stale("TPU backend unreachable within 600 s; cached result")
            os._exit(2)

    done = threading.Event()
    # per-phase deadline (ADVICE r4): the budget restarts at each phase
    # boundary instead of one global timer that includes cold AOT compiles.
    deadline = [time.monotonic() + 3600]  # covers first contact + GL compile

    def extend_deadline(seconds):
        deadline[0] = time.monotonic() + seconds

    def _phase_watchdog():
        while not done.wait(15):
            if time.monotonic() > deadline[0]:
                _emit_stale("bench phase deadline exceeded; cached result")
                os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    threading.Thread(target=_phase_watchdog, daemon=True).start()
    jax.block_until_ready(jnp.ones(()) + 1)  # first backend contact
    ready.set()

    gl_solves_per_sec, gl_step, gl_spread, roofline = _bench_gl(
        jax, jnp, np, extend_deadline
    )
    extend_deadline(900)  # dense path: small cached compile + 20 dispatches
    dense_solves_per_sec = _bench_dense(jax, jnp, np)

    done.set()
    gl_baseline = 4.0  # midpoint A100 CuPy model (range [1.9, 64]), see docstring
    dense_baseline = 18.0  # A100 f64 flop model (round-1 docstring)

    # ---- session-health normalization (VERDICT r4 next-#2) ----
    # The tunnel worker's throughput drifts up to ~2x BETWEEN sessions (and
    # ~65% within one); the fixed 100-apply stencil-chain probe measured
    # above is compared against its best-known time (kept in BENCH_CACHE) so
    # cross-round headline numbers can be normalized.  session_health <= 1;
    # 1.0 = as fast as the best session on record.
    apply_ms = roofline["stencil_apply_ms"]
    try:
        with open(CACHE_PATH) as f:
            prev_cache = json.load(f)
        best_apply_ms = float(prev_cache.get("best_apply_ms") or apply_ms)
    except Exception:
        best_apply_ms = apply_ms
    best_apply_ms = min(best_apply_ms, apply_ms)
    session_health = round(min(1.0, best_apply_ms / apply_ms), 3)

    result = (
            {
                "metric": "gl_multigrid_kkt_fwd_bwd_solves_per_sec",
                "value": round(gl_solves_per_sec, 2),
                "unit": "KKT solves/sec (bs=32, (8,32,32) n_grid=3, 1.83M vars, fwd+IFT bwd)",
                "vs_baseline": round(gl_solves_per_sec / gl_baseline, 3),
                "stale": False,
                "session_health": session_health,
                "git_commit": _git_head(),
                "best_apply_ms": round(best_apply_ms, 3),
                "extras": {
                    "gl_step_seconds": round(gl_step, 3),
                    "gl_step_median_of": 5,
                    "gl_step_spread": round(gl_spread, 3),
                    "gl_solves_per_sec_session_adjusted": round(
                        gl_solves_per_sec / max(session_health, 1e-3), 2
                    ),
                    "roofline": roofline,
                    "burgers_dense_kkt_fwd_bwd_solves_per_sec": round(
                        dense_solves_per_sec, 2
                    ),
                    "burgers_dense_vs_baseline": round(
                        dense_solves_per_sec / dense_baseline, 2
                    ),
                },
            }
    )
    result["extras"]["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()

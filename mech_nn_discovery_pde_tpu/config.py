"""Global solver configuration.

Mirrors the reference's static-class config (reference config.py:5-27) but as a
dataclass so experiment scripts / notebooks can construct and mutate instances
(the reference mutates class attributes at runtime, e.g. sparse-multigrid
transport notebook cell 18).  A module-level default instance preserves the
reference's "import and mutate" usage pattern.

Forward and backward solves read *separate* budget knobs, as in the reference.
"""

from dataclasses import dataclass, field
import os


@dataclass
class PDEConfig:
    # ---- data locations (reference config.py:6-10) ----
    data_root: str = "data"

    # ---- multigrid options (reference config.py:13-27) ----
    # smoother sweeps per V-cycle leg.  The reference runs 5 Gauss-Seidel
    # pre/post sweeps; sequential GS does not map to TPU, so the rebuild uses
    # TPU-parallel block-Chebyshev smoothing — see solvers/multigrid.py.  At
    # the default 10-step time-line-block Chebyshev, FGMRES(10, 40 iters)
    # reaches ~7x LOWER residual than the reference's 5+5 GS cycle on the 2D
    # transport benchmark.
    mg_smoother_steps_pre: int = 10
    mg_smoother_steps_post: int = 10

    # V-cycles per preconditioner application
    mg_steps_forward: int = 1
    mg_steps_backward: int = 1

    # FGMRES budgets (restart size x outer restarts)
    mg_fgmres_max_iter_forward: int = 40
    mg_fgmres_restarts_forward: int = 10
    mg_fgmres_max_iter_backward: int = 40
    mg_fgmres_restarts_backward: int = 10

    mg_fgmres_tol: float = 1e-5

    # normal-operator application inside the MG/FGMRES iteration:
    # 'stencil'        — AtA assembled once per solve into axis-aligned
    #                    block-stencil fields (ops/normal_stencil.py); every
    #                    apply is a short fused chain of flat shifted
    #                    multiply-adds.  ~10x less HBM traffic per apply than
    #                    'factored' on TPU.
    # 'stencil_pallas' — same representation, applied by a Pallas kernel
    #                    that keeps the whole sample in VMEM (one HBM read
    #                    of coef+x, one write of y).
    # 'factored'       — matrix-free A^T (A x) through the structured
    #                    shifted-slice operators (ops/structured.py).
    mg_normal_op: str = "stencil"

    # smoother selection: 'chebyshev', 'chebyshev_fused' or 'jacobi' (all
    # block-preconditioned).  'chebyshev_fused' runs the whole multi-step
    # Chebyshev pass of each level as ONE Pallas kernel per sample with the
    # stored operators VMEM-resident (ops/fused_smoother.py) — the stored
    # binv/coef are then read from HBM once per smoothing pass instead of
    # once per Chebyshev step.  Levels whose operands exceed the ~16 MB
    # VMEM budget (or 1D levels) fall back to the XLA chebyshev path; the
    # GL fine level fits with mg_precond_dtype='bf16'.  Requires a
    # stencil-family mg_normal_op and the 'line' block smoother.
    mg_smoother: str = "chebyshev"
    # Reuse the Chebyshev recurrence's final residual (a maintained loop
    # invariant r = b - A x) as the V-cycle's restriction input instead of
    # recomputing b - A x with a separate fine-level apply: zero extra
    # flops, one fewer normal-op apply (+ its HBM round trip) per level
    # per V-cycle.  Applies to both the XLA and fused chebyshev smoothers;
    # incremental-vs-fresh residual differs only by f32 rounding drift
    # (quality-guard tested).  Off = recompute (reference-shaped behavior).
    mg_smoother_residual: bool = False
    # Fuse the FGMRES matvec into the preconditioner: flexible GMRES needs
    # (z, A z) per iteration, and A z = r - res_final falls out of the
    # post-smoother's residual invariant (precondition_with_Az), removing
    # the Krylov loop's inner fine-level apply entirely.  A z is then
    # f32-accurate (preconditioner dtype) — fine for f32 solve dtypes and
    # for preconditioned tolerances >~1e-6.  Off = explicit matvec.
    mg_fused_matvec: bool = False
    # Chebyshev smoothing interval is [lmax/ratio, lmax]
    mg_chebyshev_ratio: float = 16.0
    # safety factor applied to the power-iteration lmax estimate.  This is
    # LOAD-BEARING: Chebyshev amplifies modes above the assumed lmax
    # explosively — a 22%-low estimate collapsed the GL preconditioner by
    # 375x (CLAUDE.md).  Exposed as a knob so the quality-guard CI test can
    # prove it detects that regression class; do not lower in production.
    mg_lmax_margin: float = 1.3
    # smoother block structure: 'line' (time-line blocks; strong, the
    # TPU-parallel analogue of directional Gauss-Seidel) or 'point'
    mg_block_smoother: str = "line"
    # dtype of the STORED preconditioner operators: 'f32', 'bf16' or
    # 'bf16_factored'.  The V-cycle is HBM-traffic bound on TPU (binv reads
    # ~411 MB + coef ~114 MB per batched fine-level application), and the
    # fused smoother (mg_smoother='chebyshev_fused') needs the fine level
    # under the ~16 MB/core VMEM budget — which f32 storage exceeds at GL
    # scale.  V-cycle VECTOR arithmetic, assembly, factorization and the
    # lmax power iteration stay f32 in every mode (bf16 residual vectors
    # collapse the cycle on stiff operators — measured 7e-4 -> 0.77
    # rel_rnorm on steps=0.01 transport).
    #
    # 'bf16' (everything bf16) is QUALITY-FATAL at GL scale and kept only
    # for the measured record: entrywise bf16 rounding of the cond~2e6
    # line-block inverses makes 728/1024 blocks INDEFINITE, breaking the
    # SPD smoother + Chebyshev (relres 1.0 vs 4.5e-4 @30 iters), and bf16
    # coef alone costs 25x (benchmarks/bf16_{collapse,factor,attrib,
    # mixed}_diag.py).
    #
    # 'bf16_factored' is the quality-safe low-precision mode: store the
    # PSD square-root factor W = L^-T (B^-1 = W W^T) in bf16 and apply
    # W (W^T r) — round(W) round(W)^T is PSD BY CONSTRUCTION, so the
    # smoother stays SPD and quality is indistinguishable from f32
    # (relres 4.07e-4 vs 4.04e-4 on the GL-shaped production case);
    # coef/coarse_inv stay f32 (coef bf16 is the 25x loser).  binv bytes
    # halve: the GL fine level (W bf16 6.4 MB + coef f32 4.3 MB) fits the
    # fused kernel's VMEM budget with near-f32 quality.
    #
    # Default stays 'f32' on a MEASURED same-session A/B (round 5): on the
    # XLA path the factored apply z = W (W^T r) reads the half-width W
    # twice, so HBM bytes are unchanged and the bf16 einsums additionally
    # lose layout efficiency — b30rm 7.70 s vs +bf16_factored 10.57 s
    # (1.37x slower).  The byte win is only realizable by the VMEM-resident
    # fused smoother, which the axon Mosaic backend still cannot compile.
    mg_precond_dtype: str = "f32"
    # dtype of the outer FGMRES iteration on the fine normal equations:
    # 'solver' (= f64 when solver_dbl) or 'f32'.  f32 halves the fine-matvec
    # cost ~6x on TPU (f64 is emulated); the f32 residual floor (~1e-6
    # relative) sits well below the 40-iteration budget's ~2e-4.
    # 'auto' resolves to 'f32' on TPU and 'solver' elsewhere.
    mg_solve_dtype: str = "auto"
    jacobi_w: float = 0.4
    jacobi_w_forward: float = 0.45

    # ---- precision policy ----
    # 'auto'     : 'f32_ir' on TPU (the validated configuration: f64 is
    #              software-emulated there, ~50-150x slower), 'f64' elsewhere
    # 'f64'      : everything float64 (reference semantics; emulated on TPU)
    # 'f32_ir'   : factor/solve in float32, iterative refinement with float64
    #              residuals (TPU-native mixed precision)
    # 'f32'      : everything float32
    precision: str = "auto"
    # factor-preconditioned-CG refinement steps for the mixed-precision dense
    # path (6 steps converge the Burgers-scale system to ~1e-4 solution
    # error; 8 to ~1e-6)
    ir_steps: int = 6

    # ---- solve diagnostics (reference logs fwd+bwd residual norms every
    # solve, qp_dual_sparse...:59-60,105-107, and hard-fails on indefinite
    # AtA via cholesky_ex(check_errors=True), qp_dual_dense...:39) ----
    # log per-solve forward/backward normal-residual norms (+ FGMRES
    # iteration counts on the multigrid path) through the package logger
    log_solves: bool = False
    # raise on non-finite solutions (host-side, from inside jit)
    check_finite: bool = False
    # return forward-solve stats IN-BAND as the layers' third output
    # (u0, u, stats) — jit outputs, no host callback, no re-solve; the
    # axon-compatible per-step observability path (the reference returns
    # eps=None there, so the tuple contract is unchanged)
    return_solve_stats: bool = False

    @property
    def ginzburg_dir(self) -> str:
        return os.path.join(self.data_root, "ginzburg")

    @property
    def rheology_dir(self) -> str:
        return os.path.join(self.data_root, "kamani")

    @property
    def burgers_dir(self) -> str:
        return os.path.join(self.data_root, "burgers")


# Module-level default used by layers when no config is passed explicitly.
default_config = PDEConfig()

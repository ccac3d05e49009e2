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

    # smoother selection: 'chebyshev' or 'jacobi' (both point-block
    # preconditioned)
    mg_smoother: str = "chebyshev"
    # Chebyshev smoothing interval is [lmax/ratio, lmax]
    mg_chebyshev_ratio: float = 16.0
    # smoother block structure: 'line' (time-line blocks; strong, the
    # TPU-parallel analogue of directional Gauss-Seidel) or 'point'
    mg_block_smoother: str = "line"
    # dtype of the outer FGMRES iteration on the fine normal equations:
    # 'solver' (= f64 when solver_dbl) or 'f32'.  f32 halves the fine-matvec
    # cost ~6x on TPU (f64 is emulated); the f32 residual floor (~1e-6
    # relative) sits well below the 40-iteration budget's ~2e-4.
    mg_solve_dtype: str = "solver"
    jacobi_w: float = 0.4
    jacobi_w_forward: float = 0.45

    # ---- precision policy ----
    # 'f64'      : everything float64 (reference semantics; emulated on TPU)
    # 'f32_ir'   : factor/solve in float32, iterative refinement with float64
    #              residuals (TPU-native mixed precision)
    # 'f32'      : everything float32
    precision: str = "f64"
    # factor-preconditioned-CG refinement steps for the mixed-precision dense
    # path (6 steps converge the Burgers-scale system to ~1e-4 solution
    # error; 8 to ~1e-6)
    ir_steps: int = 6

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

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
    # TPU-parallel smoothers (weighted Jacobi / Chebyshev) — see
    # solvers/multigrid.py.  Budgets kept name-compatible.
    mg_smoother_steps_pre: int = 5
    mg_smoother_steps_post: int = 5

    # V-cycles per preconditioner application
    mg_steps_forward: int = 1
    mg_steps_backward: int = 1

    # FGMRES budgets (restart size x outer restarts)
    mg_fgmres_max_iter_forward: int = 40
    mg_fgmres_restarts_forward: int = 10
    mg_fgmres_max_iter_backward: int = 40
    mg_fgmres_restarts_backward: int = 10

    mg_fgmres_tol: float = 1e-5

    # smoother selection: 'chebyshev' or 'jacobi'
    mg_smoother: str = "chebyshev"
    jacobi_w: float = 0.4
    jacobi_w_forward: float = 0.45

    # ---- precision policy ----
    # 'f64'      : everything float64 (reference semantics; emulated on TPU)
    # 'f32_ir'   : factor/solve in float32, iterative refinement with float64
    #              residuals (TPU-native mixed precision)
    # 'f32'      : everything float32
    precision: str = "f64"
    # iterative-refinement steps for the mixed-precision dense path
    ir_steps: int = 3

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

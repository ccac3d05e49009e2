"""mech_nn_discovery_pde_tpu — TPU-native Mechanistic PDE Networks.

A ground-up JAX/XLA/Pallas re-design of *Mechanistic PDE Networks for
Discovery of Governing Equations* (ICML 2025).  The framework represents a
linear(ized) PDE on a grid as an equality-constrained least-squares system
over per-grid-point unknowns (function value + all partial derivatives up to
order 2) and solves it inside the training loop as a differentiable layer.

Reference parity map (reference paths relative to the upstream repo):
  solver/lp_pde_central_diff.py  -> ops/ (multi_index, constraints, system)
  solver/qp_dual_dense_normal_kkt.py -> ops/normal_solve.py (dense path)
  solver/qp_dual_sparse_multigrid_normal_kkt.py -> ops/normal_solve.py (MG path)
  solver/pde_layer_dense.py      -> layers/dense.py
  solver/multigrid.py            -> solvers/multigrid.py + layers/multigrid.py
  solver/fgmres.py, solver/cg.py -> solvers/krylov.py
  discovery/net.py               -> models/resnet.py
  discovery/*.py                 -> discovery/
  fit/sine_pde_dense.py          -> fit/sine_fit.py
  extras/*, config.py            -> utils/, config.py

Design is TPU-first: static constraint structure built once with NumPy at
trace time, runtime fills are pure jitted gather/scatter; solves are batched
via vmap (no block-diagonal flattening); backward passes use the implicit
function theorem via custom_vjp and reuse the forward factorization/solver.
"""

from mech_nn_discovery_pde_tpu.config import PDEConfig

__version__ = "0.1.0"

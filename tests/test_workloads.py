"""End-to-end workload smoke tests: each discovery/fit harness builds, takes
optimizer steps, and produces finite decreasing loss (tiny configurations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mech_nn_discovery_pde_tpu.config import PDEConfig


def test_sine_fit_converges(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mech_nn_discovery_pde_tpu.fit.sine_fit import SineFitConfig, train

    cfg = SineFitConfig(epochs=25, pde=PDEConfig(precision="f64"))
    params, model, hist = train(cfg)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.2, hist[-1]


def test_burgers_harness_steps(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mech_nn_discovery_pde_tpu.discovery.burgers import (
        BurgersConfig,
        BurgersDiscovery,
        print_eq,
    )
    from mech_nn_discovery_pde_tpu.data.datasets import BurgersDataset
    from mech_nn_discovery_pde_tpu.discovery.common import make_update
    import optax

    cfg = BurgersConfig(
        solver_dim=(8, 16), batch_size=2, nn_transform=False,
        pde=PDEConfig(precision="f64"),
    )
    ds = BurgersDataset(solver_dim=cfg.solver_dim, data_root=str(tmp_path / "data"))
    model = BurgersDiscovery(cfg, ds)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    update = make_update(model.loss_fn, opt)
    opt_state = opt.init(params)
    patch = np.stack([ds[i][0] for i in range(2)])
    t_idx = np.array([ds[i][1] for i in range(2)])
    x_idx = np.array([ds[i][2] for i in range(2)])
    losses = []
    for _ in range(3):
        params, opt_state, loss, aux = update(
            params, opt_state, jnp.asarray(patch), jnp.asarray(t_idx), jnp.asarray(x_idx)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0]
    eq = print_eq(np.asarray(model.get_params(params)))
    assert "u_t" in eq


def test_kamani_closed_loop_error_metric():
    """closed_loop_error (the quantitative form of the reference's
    Lissajous-overlay criterion, reference discovery/kamani.py:352-455)
    scores the true parameters ~0 and a 2x-off sigma_t row ~0.5."""
    from mech_nn_discovery_pde_tpu.discovery.kamani import (
        closed_loop_error, true_params,
    )

    pr, er = true_params()
    errs = closed_loop_error(pr, er, amplitudes=(1, 10))
    assert max(errs.values()) < 0.01, errs
    pr2 = pr.copy()
    pr2[1] *= 0.5
    errs2 = closed_loop_error(pr2, er, amplitudes=(1, 10))
    assert min(errs2.values()) > 0.2, errs2


def test_kamani_closed_loop_degenerate_guard():
    """A learned model with p0 ~ 0 (zero-init coefficient head early in
    training) makes learned_rhs ~ 1/0; the eval must score it inf QUICKLY
    (call-budgeted integration) instead of grinding solve_ivp forever and
    hanging an unattended probe queue."""
    import time

    from mech_nn_discovery_pde_tpu.discovery.kamani import (
        closed_loop_error, true_params,
    )

    pr, er = true_params()
    pr0 = pr.copy()
    pr0[0] = [1e-9, 0.0, 0.0]  # degenerate: dividing row effectively zero
    t0 = time.time()
    errs = closed_loop_error(pr0, er, amplitudes=(1, 10))
    assert time.time() - t0 < 120.0
    assert all(e == float("inf") or e > 1.0 for e in errs.values()), errs


def test_kamani_harness_steps(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mech_nn_discovery_pde_tpu.discovery.kamani import (
        KamaniConfig,
        KamaniDiscovery,
    )
    from mech_nn_discovery_pde_tpu.data.datasets import KamaniDataset
    from mech_nn_discovery_pde_tpu.discovery.common import make_update
    import optax

    # tiny synthetic kamani dataset (avoid the 500-amplitude solve_ivp sweep)
    import mech_nn_discovery_pde_tpu.data.generate as gen
    import os

    d = tmp_path / "data" / "kamani"
    os.makedirs(d, exist_ok=True)
    u, t = gen.kamani(n_t=96, n_amp=6)
    np.save(d / "kamani_traj.npy", u)
    np.save(d / "times.npy", t)

    cfg = KamaniConfig(batch_size=4, pde=PDEConfig(precision="f64"), plot_every=0)
    ds = KamaniDataset(solver_dim=cfg.solver_dim, data_root=str(tmp_path / "data"))
    model = KamaniDiscovery(cfg, ds)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    update = make_update(model.loss_fn, opt)
    opt_state = opt.init(params)
    items = [ds[i] for i in range(4)]
    u_b = np.stack([it[1] for it in items])
    sd_b = np.stack([it[3] for it in items])
    sdd_b = np.stack([it[4] for it in items])
    losses = []
    for _ in range(3):
        params, opt_state, loss, aux = update(
            params, opt_state, jnp.asarray(u_b), jnp.asarray(sd_b), jnp.asarray(sdd_b)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    pr, er = model.get_params(params)
    assert float(pr[3, 0]) == 1.0  # pinned scale
    assert np.all(np.abs(np.asarray(er)) <= 2.0)  # exponent range


def test_kamani_deviation_knobs():
    """Basin-escape deviation knobs (documented deviations from the shipped
    reference protocol, VALIDATION.md round 3): exp_init_bias shifts the
    exponent-squash so the init respects the shear-thinning sign prior, and
    the L1 warmup fraction ramps linearly."""
    from mech_nn_discovery_pde_tpu.discovery.kamani import (
        KamaniConfig,
        KamaniDiscovery,
    )

    class FakeDS:
        t_step = 0.05

    def er_mean(bias):
        cfg = KamaniConfig(
            batch_size=2, pde=PDEConfig(precision="f64"), plot_every=0,
            exp_init_bias=bias,
        )
        m = KamaniDiscovery(cfg, FakeDS())
        params = m.init(jax.random.PRNGKey(0))
        _, er = m.get_params(params)
        return float(er.mean())

    assert abs(er_mean(0.0)) < 0.5  # reference behavior: centered
    assert er_mean(-0.55) < -0.6  # prior shifts the init negative
    # warmup schedule values as used by the train loop
    cfg = KamaniConfig(l1_warmup_epochs=100)
    fracs = [min(1.0, e / cfg.l1_warmup_epochs) for e in (0, 50, 100, 200)]
    assert fracs == [0.0, 0.5, 1.0, 1.0]

    # pnet_zero_init starts all unpinned coefficient rows at exactly 0;
    # pnet_out_scale multiplies the head output
    cfg = KamaniConfig(batch_size=2, pde=PDEConfig(precision="f64"),
                       plot_every=0, pnet_zero_init=True, pnet_out_scale=10.0)
    m = KamaniDiscovery(cfg, FakeDS())
    params = m.init(jax.random.PRNGKey(0))
    pr, _ = m.get_params(params)
    assert float(jnp.abs(pr[:3]).max()) == 0.0
    assert float(pr[3, 0]) == 1.0

    # exp_freeze_epochs: enet is held fixed during the freeze window while
    # the other nets move, then unfreezes
    from mech_nn_discovery_pde_tpu.discovery.kamani import build_optimizer
    import optax

    cfg = KamaniConfig(batch_size=2, exp_freeze_epochs=2)
    m = KamaniDiscovery(cfg, FakeDS())
    params = m.init(jax.random.PRNGKey(0))
    opt = build_optimizer(cfg, cfg.lr, steps_per_epoch=1)
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    p = params
    for step in range(4):
        upd, st = opt.update(grads, st, p)
        p = optax.apply_updates(p, upd)
        e_moved = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree.leaves(p["enet"]),
                            jax.tree.leaves(params["enet"]))
        )
        assert e_moved == (step >= 2), f"step {step}: enet moved={e_moved}"
    assert float(jnp.abs(
        jax.tree.leaves(p["pnet"])[0] - jax.tree.leaves(params["pnet"])[0]
    ).max()) > 0

    # exp_lr_scale: permanently rescales the enet step size (composable
    # with the freeze); scale 0 pins enet forever while pnet moves
    cfg = KamaniConfig(batch_size=2, exp_lr_scale=0.0)
    m = KamaniDiscovery(cfg, FakeDS())
    params = m.init(jax.random.PRNGKey(0))
    opt = build_optimizer(cfg, cfg.lr, steps_per_epoch=1)
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    p = params
    for _ in range(3):
        upd, st = opt.update(grads, st, p)
        p = optax.apply_updates(p, upd)
    assert all(
        float(jnp.abs(a - b).max()) == 0
        for a, b in zip(jax.tree.leaves(p["enet"]),
                        jax.tree.leaves(params["enet"]))
    )
    assert float(jnp.abs(
        jax.tree.leaves(p["pnet"])[0] - jax.tree.leaves(params["pnet"])[0]
    ).max()) > 0
    # a fractional scale shrinks the enet Adam step by that factor
    cfg = KamaniConfig(batch_size=2, exp_lr_scale=0.1)
    opt = build_optimizer(cfg, cfg.lr, steps_per_epoch=1)
    st = opt.init(params)
    upd, _ = opt.update(grads, st, params)
    e_step = float(jnp.abs(jax.tree.leaves(upd["enet"])[0]).max())
    m_step = float(jnp.abs(jax.tree.leaves(upd["pnet"])[0]).max())
    assert abs(e_step - 0.1 * m_step) < 1e-9 * max(m_step, 1.0)

    # exp_l2: the raw-space tether adds exactly exp_l2 * mean(raw^2) to the
    # training loss (checked through loss_fn, not by re-deriving the formula)
    def full_loss(exp_l2):
        cfg = KamaniConfig(
            batch_size=2, pde=PDEConfig(precision="f64"), plot_every=0,
            exp_init_bias=-0.55, exp_l2=exp_l2,
        )
        mm = KamaniDiscovery(cfg, FakeDS())
        pp = mm.init(jax.random.PRNGKey(0))
        u = jnp.ones((2, 24), dtype=jnp.float64)
        sd = 0.5 * jnp.ones((2, 24), dtype=jnp.float64)
        sdd = jnp.zeros((2, 24), dtype=jnp.float64)
        loss, _ = mm.loss_fn(pp, u, sd, sdd)
        raw = mm.param_exp_net.apply(pp["enet"]) + cfg.exp_init_bias
        return float(loss), float(jnp.mean(raw**2))

    l0, _ = full_loss(0.0)
    l1, msq = full_loss(0.03)
    assert msq > 0.0
    np.testing.assert_allclose(l1 - l0, 0.03 * msq, rtol=1e-6)


def test_gl_harness_steps(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mech_nn_discovery_pde_tpu.discovery.ginzburg_landau import (
        GLConfig,
        GLDiscovery,
        print_eq,
    )
    from mech_nn_discovery_pde_tpu.discovery.common import make_update
    import optax

    cfg = GLConfig(
        solver_dim=(6, 16, 16), n_grid=2, batch_size=2, nn_transform=False,
        pde=PDEConfig(precision="f64"),
    )

    class TinyDS:
        t_step_size = 0.2
        x_step_size = 0.3906
        y_step_size = 0.3906

    model = GLDiscovery(cfg, TinyDS())
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
    update = make_update(model.loss_fn, opt)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((2, 6, 16, 16)) * 0.3
    v = rng.standard_normal((2, 6, 16, 16)) * 0.3
    losses = []
    for _ in range(2):
        params, opt_state, loss, aux = update(
            params, opt_state, jnp.asarray(u), jnp.asarray(v)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    eq = print_eq([np.asarray(p) for p in model.get_params(params)])
    assert "u_t" in eq


def test_gl_stretch_configs_step():
    """The two GL workload-config corners (VERDICT r2 #8): second equation
    (first_equation=False, reference ginzburg_landau.py:66-67) and the
    ResNet transform (nn_transform=True, reference default) both take
    finite optimization steps on a tiny system."""
    from mech_nn_discovery_pde_tpu.discovery.ginzburg_landau import (
        GLConfig,
        GLDiscovery,
    )
    from mech_nn_discovery_pde_tpu.discovery.common import make_update
    import optax

    class TinyDS:
        t_step_size = 0.2
        x_step_size = 0.3906
        y_step_size = 0.3906

    rng = np.random.default_rng(0)
    u = rng.standard_normal((2, 6, 16, 16)) * 0.3
    v = rng.standard_normal((2, 6, 16, 16)) * 0.3
    for opts in (dict(first_equation=False), dict(nn_transform=True)):
        cfg = GLConfig(
            solver_dim=(6, 16, 16), n_grid=2, batch_size=2,
            pde=PDEConfig(precision="f64"),
            **{"nn_transform": False, **opts},
        )
        model = GLDiscovery(cfg, TinyDS())
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-4)
        update = make_update(model.loss_fn, opt)
        opt_state = opt.init(params)
        params, opt_state, loss, aux = update(
            params, opt_state, jnp.asarray(u), jnp.asarray(v)
        )
        assert np.isfinite(float(loss)), opts


def test_train_harness_checkpoint_resume(tmp_path):
    """TrainHarness saves at ckpt_every and a fresh harness resumes: params
    and opt_state round-trip and start_epoch advances (SURVEY 5.4)."""
    import optax
    from mech_nn_discovery_pde_tpu.discovery.common import TrainHarness

    params = {"w": jnp.arange(4.0), "b": {"x": jnp.ones((2, 3))}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    run_dir = str(tmp_path / "run")
    import os

    os.makedirs(run_dir, exist_ok=True)

    h = TrainHarness(run_dir, params, opt_state, ckpt_every=1)
    assert h.start_epoch == 0
    # mutate params as a training epoch would, then checkpoint
    params2 = jax.tree.map(lambda a: a + 1.0, params)
    h.end_epoch(0, params2, opt_state)

    h2 = TrainHarness(run_dir, params, opt_state, ckpt_every=1)
    assert h2.start_epoch == 1
    for a, b in zip(jax.tree.leaves(h2.params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_resume_end_to_end(tmp_path, monkeypatch):
    """Full loop: run 1 epoch of Burgers training in a run dir, then call
    train() again with resume_from pointing at it — it must resume at epoch 1
    with the checkpointed parameters (not re-init)."""
    monkeypatch.chdir(tmp_path)
    from mech_nn_discovery_pde_tpu.discovery.burgers import BurgersConfig, train

    cfg = BurgersConfig(
        solver_dim=(8, 16), batch_size=2, nn_transform=False, epochs=1,
        steps_per_epoch=1, ckpt_every=1,
        pde=PDEConfig(precision="f64"),
        data_root=str(tmp_path / "data"),
    )
    params1, _ = train(cfg)
    run_dir = str(tmp_path / "logs" / "burgers" / "0")
    cfg2 = BurgersConfig(
        solver_dim=(8, 16), batch_size=2, nn_transform=False, epochs=2,
        steps_per_epoch=1, ckpt_every=1, resume_from=run_dir,
        pde=PDEConfig(precision="f64"),
        data_root=str(tmp_path / "data"),
    )
    params2, _ = train(cfg2)
    # resumed run trained one more epoch on top of the checkpoint
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params2))
    ]
    assert max(diffs) > 0.0


def test_burgers_noise_and_frame_drop_robustness(tmp_path, monkeypatch):
    """Training steps remain finite and the loss decreases with the
    reference's robustness fault injections active: Gaussian measurement
    noise + whole-frame dropout with loss masking (reference
    burgers...:63-64,96-100,139-141,364-375)."""
    monkeypatch.chdir(tmp_path)
    import optax

    from mech_nn_discovery_pde_tpu.data.datasets import BurgersDataset
    from mech_nn_discovery_pde_tpu.discovery.burgers import (
        BurgersConfig,
        BurgersDiscovery,
    )
    from mech_nn_discovery_pde_tpu.discovery.common import make_update

    cfg = BurgersConfig(
        solver_dim=(8, 16), batch_size=2, nn_transform=False,
        noise_percent=5.0, frame_drop_prob=0.2,
        pde=PDEConfig(precision="f64"),
    )
    ds = BurgersDataset(
        solver_dim=cfg.solver_dim, data_root=str(tmp_path / "data"),
        noise_percent=cfg.noise_percent, frame_drop_prob=cfg.frame_drop_prob,
    )
    model = BurgersDiscovery(cfg, ds)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    update = make_update(model.loss_fn, opt)
    opt_state = opt.init(params)
    patch = np.stack([ds[i][0] for i in range(2)])
    t_idx = np.array([ds[i][1] for i in range(2)])
    x_idx = np.array([ds[i][2] for i in range(2)])
    losses = []
    for _ in range(4):
        params, opt_state, loss, aux = update(
            params, opt_state, jnp.asarray(patch), jnp.asarray(t_idx),
            jnp.asarray(x_idx),
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

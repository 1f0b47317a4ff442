"""Controller tests: full-step oracle parity (the 1e-3 RMS accuracy target
from BASELINE.md), closed-loop ergodic-metric descent (config 1/2), history
modes, and safety-path wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.config import default_config
from ergodic_exploration_tpu.controller import ErgodicController, World
from ergodic_exploration_tpu.grid import Domain
from ergodic_exploration_tpu.ops import basis, target
from ergodic_exploration_tpu.ops.integrator import rk4_step

import oracle

DOM = Domain.create(0.0, 0.0, 2.0, 2.0)


def _cart_cfg(**kw):
    cfg = default_config("cart").replace(
        num_basis=6, horizon=10, enable_safety=False, buffer_capacity=64,
        # full-history concat: deterministic c_k for oracle parity
        buffer_batch=None, **kw
    )
    return cfg


def _gauss_phik(ctrl, dom, mean=(1.4, 1.4), cov=0.05):
    pts = dom.sample_lattice((40, 40))
    gmm = target.GaussianMixture.create([mean], np.array([[[cov, 0.0], [0.0, cov]]]))
    phi = target.gmm_target_values(pts, gmm)
    return ctrl.target_coefficients(phi, pts, dom)


def test_step_shapes_and_jit():
    cfg = _cart_cfg()
    ctrl = ErgodicController(cfg)
    world = World.empty(DOM)
    state = ctrl.init_state()
    phik = _gauss_phik(ctrl, DOM)
    x = jnp.array([0.3, 0.3, 0.0])
    vb = jnp.zeros(3)
    step = jax.jit(ctrl.step)
    new_state, u, diag = step(state, x, vb, phik, world)
    assert u.shape == (2,)
    assert new_state.U.shape == (cfg.horizon, 2)
    assert int(new_state.hist_count) == 1
    assert np.isfinite(float(diag.ergodic_metric))


def test_full_step_matches_oracle():
    """One controller tick vs the independent NumPy implementation of
    SURVEY.md A.1-A.5 — transcription check at the 1e-3 level."""
    cfg = _cart_cfg()
    ctrl = ErgodicController(cfg)
    world = World.empty(DOM)
    K = cfg.num_basis
    rng = np.random.default_rng(7)

    # nontrivial warm-started sequence + some history
    U0 = rng.uniform(-2, 2, size=(cfg.horizon, 2))
    hist = rng.uniform(0.2, 1.8, size=(5, 2))
    x0 = np.array([0.5, 0.6, 0.4])

    state = ctrl.init_state()
    state = state._replace(U=jnp.asarray(U0, jnp.float32))
    for p in hist:
        state = state._replace(buffer=state.buffer.append(jnp.asarray(p, jnp.float32)))

    pts = DOM.sample_lattice((30, 30))
    gmm = target.GaussianMixture.create([[1.4, 1.4]], np.array([[[0.05, 0.0], [0.0, 0.05]]]))
    phi = target.gmm_target_values(pts, gmm)
    phik = ctrl.target_coefficients(phi, pts, DOM)

    new_state, u_cmd, diag = jax.jit(ctrl.step)(
        state, jnp.asarray(x0, jnp.float32), jnp.zeros(3), phik, world
    )

    r, b = cfg.cart.wheel_radius, cfg.cart.wheel_base

    def f(x, u):
        return oracle.cart_f(x, u, r, b)

    def A_fn(x, u):
        v = 0.5 * r * (u[0] + u[1])
        A = np.zeros((3, 3))
        A[0, 2] = -v * np.sin(x[2])
        A[1, 2] = v * np.cos(x[2])
        return A

    def B_fn(x, u):
        c, s = np.cos(x[2]), np.sin(x[2])
        return np.array([[0.5 * r * c, 0.5 * r * c], [0.5 * r * s, 0.5 * r * s], [-r / b, r / b]])

    U_want, rhos, metric_want = oracle.ergodic_step(
        f, A_fn, B_fn, x0, U0, cfg.dt, np.asarray(phik), K, [0.0, 0.0], [2.0, 2.0],
        hist, cfg.ergodic_weight, cfg.barrier_weight, cfg.barrier_boundary_weight,
        cfg.barrier_eps, cfg.r_diag, cfg.u_min, cfg.u_max,
    )

    np.testing.assert_allclose(np.asarray(u_cmd), U_want[0], atol=2e-3)
    # state.U is U_new shifted left with a zero pad
    np.testing.assert_allclose(np.asarray(new_state.U[:-1]), U_want[1:], atol=2e-3)
    np.testing.assert_allclose(np.asarray(new_state.U[-1]), 0.0)
    np.testing.assert_allclose(float(diag.ergodic_metric), metric_want, rtol=1e-3)


def _closed_loop(ctrl, phik, world, x0, n_steps):
    model = ctrl.model
    step = jax.jit(ctrl.step)
    state = ctrl.init_state()
    x = x0
    metrics, xs = [], [np.asarray(x)]
    vb = jnp.zeros(3)
    for _ in range(n_steps):
        state, u, diag = step(state, x, vb, phik, world)
        x = rk4_step(model.f, x, u, ctrl.config.dt)
        vb = model.twist(u)
        metrics.append(float(diag.ergodic_metric))
        xs.append(np.asarray(x))
    return np.asarray(metrics), np.stack(xs)


def test_config1_cart_gaussian_metric_decreases():
    """BASELINE config 1: cart, single Gaussian, H=20, dt=0.1, no obstacles."""
    cfg = default_config("cart").replace(num_basis=8, enable_safety=False)
    ctrl = ErgodicController(cfg)
    world = World.empty(DOM)
    phik = _gauss_phik(ctrl, DOM)
    metrics, xs = _closed_loop(ctrl, phik, world, jnp.array([0.4, 0.4, 0.0]), 60)
    assert np.mean(metrics[-10:]) < np.mean(metrics[:10])
    # the robot moved and stayed inside the domain
    assert np.ptp(xs[:, 0]) > 0.1
    assert xs[:, :2].min() > -0.05 and xs[:, :2].max() < 2.05


def test_config2_omni_gmm_metric_decreases():
    """BASELINE config 2: omni, 2-component GMM, H=20."""
    cfg = default_config("omni").replace(num_basis=8, enable_safety=False)
    ctrl = ErgodicController(cfg)
    world = World.empty(DOM)
    pts = DOM.sample_lattice((40, 40))
    gmm = target.GaussianMixture.create(
        [[0.5, 1.5], [1.5, 0.5]],
        np.array([[[0.04, 0.0], [0.0, 0.04]], [[0.04, 0.0], [0.0, 0.04]]]),
        [0.5, 0.5],
    )
    phi = target.gmm_target_values(pts, gmm)
    phik = ctrl.target_coefficients(phi, pts, DOM)
    # start OFF the exact saddle between the two modes: at (1, 1) the ergodic
    # gradient is identically zero by symmetry and the robot never moves
    metrics, xs = _closed_loop(ctrl, phik, world, jnp.array([0.8, 1.1, 0.3]), 60)
    assert np.mean(metrics[-10:]) < np.mean(metrics[:10])
    assert np.ptp(xs[:, 1]) > 0.1


def test_accumulate_history_matches_ring_before_overflow():
    """With the buffer far from full, accumulate mode must equal ring mode."""
    phik_cfg = _cart_cfg()
    world = World.empty(DOM)
    x = jnp.array([0.7, 0.7, 0.2])
    results = {}
    for mode in ("ring", "accumulate"):
        cfg = _cart_cfg().replace(history=mode)
        ctrl = ErgodicController(cfg)
        phik = _gauss_phik(ctrl, DOM)
        state = ctrl.init_state()
        step = jax.jit(ctrl.step)
        us = []
        xx = x
        vb = jnp.zeros(3)
        for _ in range(8):
            state, u, _ = step(state, xx, vb, phik, world)
            xx = rk4_step(ctrl.model.f, xx, u, cfg.dt)
            us.append(np.asarray(u))
        results[mode] = np.stack(us)
    np.testing.assert_allclose(results["ring"], results["accumulate"], atol=1e-5)
    del phik_cfg


def test_safety_path_engages_near_wall():
    """Controller with safety enabled near a wall: emitted command is
    collision-free (validation + DWA wiring)."""
    import dataclasses

    from ergodic_exploration_tpu.grid import GridMap
    from ergodic_exploration_tpu.ops.distance import DistanceField

    raw = np.zeros((40, 40), dtype=np.int8)
    raw[:, 20:22] = 100  # wall at x ~ 2.0-2.2 in a 4x4 m map
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    cfg = default_config("cart").replace(
        num_basis=6, horizon=10, boundary_radius=0.15,
    )
    cfg = cfg.replace(dwa=dataclasses.replace(cfg.dwa, acc_lim=(3.0, 1.0, 5.0)))
    ctrl = ErgodicController(cfg)
    world = World(domain=g.domain(), dist=DistanceField.from_grid(g))
    # target on the FAR side of the wall: the ergodic pull drives into it
    pts = g.domain().sample_lattice((40, 40))
    gmm = target.GaussianMixture.create([[3.2, 2.0]], np.array([[[0.05, 0.0], [0.0, 0.05]]]))
    phik = ctrl.target_coefficients(target.gmm_target_values(pts, gmm), pts, g.domain())
    metrics, xs = _closed_loop(ctrl, phik, world, jnp.array([1.2, 2.0, 0.0]), 40)
    d, _ = world.dist.query(jnp.asarray(xs[:, :2], jnp.float32))
    assert float(jnp.min(d)) > 0.0  # never entered a wall cell


def test_step_differentiable_wrt_target():
    """The whole jitted solve differentiates end-to-end (enables gradient-
    based target/gain tuning — a capability the C++ reference cannot offer).
    d(metric)/d(phik) must match the analytic -2 Lambda (c_k - phi_k)."""
    import jax

    from ergodic_exploration_tpu.ops import basis

    cfg = _cart_cfg(history="accumulate")
    ctrl = ErgodicController(cfg)
    world = World.empty(DOM)
    K = cfg.num_basis
    state = ctrl.init_state()
    x0 = jnp.array([0.5, 0.6, 0.4])
    rng = np.random.default_rng(0)
    phik = jnp.asarray(rng.uniform(-0.05, 0.05, (K, K)).astype(np.float32))

    def metric_of(phik):
        _, _, diag = ctrl.step(state, x0, jnp.zeros(3), phik, world)
        return diag.ergodic_metric

    g = jax.jit(jax.grad(metric_of))(phik)
    assert np.all(np.isfinite(np.asarray(g)))
    # analytic check: E = sum lam (ck - phik)^2 with ck independent of phik
    X = ctrl.predicted_path(state, x0)
    tbl = basis.tables(X[:-1, :2], K, DOM)
    hk = basis.hk_norm(K, DOM.lengths)
    ck = basis.coefficients(tbl, jnp.ones(cfg.horizon), hk) / cfg.horizon
    lam = basis.lambda_weights(K)
    want = -2.0 * lam * (ck - phik)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-5)

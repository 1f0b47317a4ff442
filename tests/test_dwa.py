"""DWA fallback tests: window geometry, feasibility masking, never-collide."""

import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.config import default_config
from ergodic_exploration_tpu.grid import Domain, GridMap
from ergodic_exploration_tpu.models import make_model
from ergodic_exploration_tpu.ops.collision import CRASH, validate_control
from ergodic_exploration_tpu.ops.distance import DistanceField
from ergodic_exploration_tpu.ops.dwa import candidate_twists, dwa_control
from ergodic_exploration_tpu.ops.integrator import rollout


def _open_world():
    dom = Domain.create(0.0, 0.0, 5.0, 5.0)
    return dom, DistanceField.empty((4, 4))


def _walled_world():
    """Wall across x = 2.0..2.1, domain 4x4 m."""
    raw = np.zeros((40, 40), dtype=np.int8)
    raw[:, 20] = 100
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    return g.domain(), DistanceField.from_grid(g)


def test_candidate_twists_window():
    cfg = default_config("cart")
    vb = jnp.array([0.2, 0.0, 0.0])
    tws = np.asarray(candidate_twists(vb, cfg.dwa))
    nvx, nvy, nw = cfg.dwa.samples
    assert tws.shape == (nvx * nvy * nw, 3)
    ax, _, aw = cfg.dwa.acc_lim
    assert tws[:, 0].min() >= 0.2 - ax * cfg.dwa.dt - 1e-6
    assert tws[:, 0].max() <= 0.2 + ax * cfg.dwa.dt + 1e-6
    assert (tws[:, 1] == 0.0).all()  # cart: vy collapsed to zero


def test_open_world_returns_reference_control():
    """No obstacles and u_ref realizable inside the window -> DWA returns
    (approximately) the reference control itself."""
    cfg = default_config("cart")
    model = make_model(cfg)
    dom, f = _open_world()
    x = jnp.array([2.5, 2.5, 0.0])
    vb = jnp.array([0.1, 0.0, 0.0])
    # reference = a twist that is exactly one of the candidates: vb center
    u_ref = model.from_twist(vb)
    u, feasible = dwa_control(model, x, vb, u_ref, dom, f, cfg)
    assert bool(feasible)
    np.testing.assert_allclose(
        np.asarray(model.twist(u)), np.asarray(vb), atol=1e-5
    )


def test_dwa_avoids_wall():
    """Driving straight at a wall: the ergodic control crashes in validation,
    the DWA pick must not."""
    import dataclasses

    cfg = default_config("cart").replace(boundary_radius=0.15)
    # open the accel window enough that "slow down to a stop" is reachable
    cfg = cfg.replace(dwa=dataclasses.replace(cfg.dwa, acc_lim=(3.0, 1.0, 5.0)))
    model = make_model(cfg)
    dom, f = _walled_world()
    x = jnp.array([1.75, 2.0, 0.0])  # facing the wall at x~2.05
    vb = jnp.array([0.3, 0.0, 0.0])
    u_ref = model.from_twist(jnp.array([0.3, 0.0, 0.0]))
    assert int(validate_control(model, x, u_ref, dom, f, cfg)) == CRASH
    u, feasible = dwa_control(model, x, vb, u_ref, dom, f, cfg)
    assert bool(feasible)
    U = jnp.tile(u[None, :], (cfg.dwa.horizon, 1))
    X = rollout(model, x, U, cfg.dwa.dt)
    d, _ = f.query(X[1:, :2])
    assert float(jnp.min(d)) > cfg.boundary_radius


def test_dwa_infeasible_stops():
    """Boxed in on all sides -> zero control."""
    raw = np.zeros((30, 30), dtype=np.int8)
    raw[12:18, 12:18] = 100
    raw[14:16, 14:16] = 0  # tiny pocket
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    cfg = default_config("cart").replace(boundary_radius=0.3)
    model = make_model(cfg)
    f = DistanceField.from_grid(g)
    x = jnp.array([1.5, 1.5, 0.0])
    vb = jnp.array([0.3, 0.0, 0.0])
    u, feasible = dwa_control(model, x, vb, model.from_twist(vb), g.domain(), f, cfg)
    assert not bool(feasible)
    np.testing.assert_allclose(np.asarray(u), 0.0)


def test_omni_dwa_uses_lateral_candidates():
    """Omni window samples vy too; boxed ahead, free to the side -> the
    fallback picks a twist with lateral motion rather than stopping."""
    import dataclasses

    raw = np.zeros((40, 40), dtype=np.int8)
    raw[:, 20:24] = 100  # wall ahead (x ~ 2.0..2.4)
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    cfg = default_config("omni").replace(boundary_radius=0.15)
    cfg = cfg.replace(dwa=dataclasses.replace(cfg.dwa, samples=(5, 5, 5), acc_lim=(3.0, 3.0, 5.0)))
    model = make_model(cfg)
    f = DistanceField.from_grid(g)
    x = jnp.array([1.85, 2.0, 0.0])
    vb = jnp.array([0.3, 0.0, 0.0])  # heading straight at the wall
    u_ref = model.from_twist(vb)
    assert int(validate_control(model, x, u_ref, g.domain(), f, cfg)) == CRASH
    u, feasible = dwa_control(model, x, vb, u_ref, g.domain(), f, cfg)
    assert bool(feasible)
    tw = np.asarray(model.twist(u))
    # the chosen twist must not still crash
    U = jnp.tile(u[None, :], (cfg.dwa.horizon, 1))
    X = rollout(model, x, U, cfg.dwa.dt)
    d, _ = f.query(X[1:, :2])
    assert float(jnp.min(d)) > cfg.boundary_radius


def test_safety_subpatch_is_exact():
    """The safety stage's central patch crop (cfg.safety_patch_cells) must be
    invisible: full controller steps with the cropped vs full window produce
    IDENTICAL controls and collision codes in a wall scene where DWA fires."""
    import jax

    from ergodic_exploration_tpu.controller import ErgodicController, World
    from ergodic_exploration_tpu.ops import target
    from ergodic_exploration_tpu.ops.patch import extract_patch

    raw = np.zeros((40, 40), dtype=np.int8)
    raw[:, 20] = 100
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    dom = g.domain()
    f = DistanceField.from_grid(g)

    # ops-level: queries within the safety reach are bit-identical
    patch = extract_patch(f, jnp.array([1.8, 2.0]), 48)
    crop = patch.center_crop(16)
    q = jnp.stack(
        jnp.meshgrid(jnp.linspace(1.45, 2.15, 9), jnp.linspace(1.65, 2.35, 9)),
        axis=-1,
    ).reshape(-1, 2)  # +-0.35 m around the pose
    np.testing.assert_array_equal(
        np.asarray(patch.query_dist(q)), np.asarray(crop.query_dist(q))
    )

    # controller-level: cropped (default) vs full safety window
    base = default_config("cart").replace(
        num_basis=6, buffer_batch=None, ergodic_weight=400.0,
        barrier_obstacle_weight=0.0,  # let the ergodic pull hit the wall
    )
    gmm = target.GaussianMixture.create(
        [(3.5, 2.0)], np.array([[[0.08, 0.0], [0.0, 0.08]]])
    )
    world = World(domain=dom, dist=f)
    outs = {}
    for sp in (16, 48):
        cfg = base.replace(safety_patch_cells=sp)
        ctrl = ErgodicController(cfg)
        pts = dom.sample_lattice(cfg.grid_samples)
        phik = ctrl.target_coefficients(target.gmm_target_values(pts, gmm), pts, dom)
        model = make_model(cfg)
        state = ctrl.init_state()
        x = jnp.array([1.6, 2.0, 0.0])  # facing the wall, target behind it
        vb = jnp.zeros(3)
        step = jax.jit(ctrl.step)
        us, codes, dwas = [], [], []
        for _ in range(40):  # closed loop: drive toward the wall
            state, u, diag = step(state, x, vb, phik, world)
            x = rollout(model, x, u[None, :], cfg.dt)[-1]
            vb = model.twist(u)
            us.append(np.asarray(u))
            codes.append(int(diag.collision_code))
            dwas.append(bool(diag.dwa_active))
        outs[sp] = (np.stack(us), codes, dwas)
    assert any(outs[16][2]), "DWA never fired; scene does not exercise safety"
    np.testing.assert_array_equal(outs[16][0], outs[48][0])
    assert outs[16][1] == outs[48][1]
    assert outs[16][2] == outs[48][2]


def test_cost_space_control_vs_twist_pick_different_candidates():
    """VERDICT r1 item 5: reference cost is ||u_cand - u_ergodic||^2 in
    CONTROL space (SURVEY.md A.6). For the cart the wheel map weights
    (v, omega) differently (control cost ~ dv^2 + (b/2)^2 dw^2), so with the
    straight-ahead corner candidate blocked by an obstacle, twist-space
    prefers rotating in place while control-space prefers driving straight.
    """
    import dataclasses

    # obstacle block front-left of the robot at (0.8, 0.8, 0): the
    # best-in-both-spaces corner candidate (vx=0.5, w=0.6) arcs into it
    raw = np.zeros((40, 40), dtype=np.int8)
    raw[19:21, 24:26] = 100  # y in [0.95, 1.05], x in [1.2, 1.3]
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.05)
    dom, f = g.domain(), DistanceField.from_grid(g)

    base = default_config("cart").replace(
        boundary_radius=0.1, d_safe=0.15,
        dwa=dataclasses.replace(
            default_config("cart").dwa,
            samples=(3, 1, 3), acc_lim=(5.0, 5.0, 6.0), vel_lim=(0.5, 0.5, 0.6),
            horizon=10, dt=0.1,
        ),
    )
    model = make_model(base)
    x = jnp.array([0.8, 0.8, 0.0])
    vb = jnp.zeros(3)
    u_ref = model.from_twist(jnp.array([1.0, 0.0, 1.2]))  # outside the window

    def run(space):
        cfg = base.replace(dwa=dataclasses.replace(base.dwa, cost_space=space))
        u, feas = dwa_control(model, x, vb, u_ref, dom, f, cfg)
        assert bool(feas)
        return np.asarray(model.twist(u))

    tw_control = run("control")
    tw_twist = run("twist")
    # twist-space: rotate in place toward the reference heading rate
    assert abs(tw_twist[0]) < 1e-5 and abs(tw_twist[2] - 0.6) < 1e-5
    # control-space (reference): drive straight at the window's max speed
    assert abs(tw_control[0] - 0.5) < 1e-5 and abs(tw_control[2]) < 1e-5
    assert not np.allclose(tw_control, tw_twist)

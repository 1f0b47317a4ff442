"""Range-sensor reveal tests: disc model semantics and the occlusion-aware
ray-cast visibility transform (VERDICT r2 item 7 — cells behind walls must
stay unknown, matching the reference's SLAM-sourced /map, SURVEY.md 4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.grid import GridMap
from ergodic_exploration_tpu.ops import sensor


def _world(wall=True):
    """5 m x 5 m, 50x50 cells (res 0.1); vertical wall x=2.45..2.55 m
    spanning y=1..4 m."""
    data = np.zeros((50, 50), np.float32)
    if wall:
        data[10:40, 24:26] = 1.0
    truth = GridMap.create(data, 0.0, 0.0, 0.1)
    belief = truth._replace(data=jnp.full_like(truth.data, -1.0))
    return truth, belief


def test_disc_reveal_is_xray():
    truth, belief = _world()
    pose = jnp.array([1.5, 2.5, 0.0])
    b = sensor.reveal(belief, truth, pose, 2.0)
    data = np.asarray(b.data)
    # disc model sees THROUGH the wall: cell at (3.2, 2.5) is revealed
    assert data[25, 32] >= 0.0
    assert float(sensor.fraction_known(b)) > 0.3


def test_raycast_blocks_behind_walls_and_matches_disc_in_open_space():
    truth, belief = _world()
    pose = jnp.array([1.5, 2.5, 0.0])
    rng, res = 2.0, 0.1
    win = sensor.raycast_window_cells(rng, res)
    b = sensor.reveal_raycast(belief, truth, pose, rng, win)
    data = np.asarray(b.data)

    # in front of the wall: revealed free
    assert data[25, 20] == 0.0
    # the wall cells themselves: revealed occupied
    assert data[25, 24] == 1.0
    # strictly behind the wall (same ray direction): stays unknown
    assert data[25, 30] == -1.0 and data[25, 32] == -1.0
    assert data[20, 30] == -1.0  # off-axis shadow too
    # outside sensor range: unknown
    assert data[25, 48] == -1.0
    # the revealed set is a subset of the disc reveal
    b_disc = sensor.reveal(belief, truth, pose, rng)
    known_rc = np.asarray(b.data) >= 0
    known_disc = np.asarray(b_disc.data) >= 0
    assert not np.any(known_rc & ~known_disc)
    assert known_rc.sum() < known_disc.sum()

    # open space (no wall): ray-cast == disc exactly
    truth_o, belief_o = _world(wall=False)
    b1 = sensor.reveal_raycast(belief_o, truth_o, pose, rng, win)
    b2 = sensor.reveal(belief_o, truth_o, pose, rng)
    np.testing.assert_array_equal(np.asarray(b1.data), np.asarray(b2.data))


def test_raycast_is_monotone_and_idempotent():
    truth, belief = _world()
    win = sensor.raycast_window_cells(1.5, 0.1)
    p1 = jnp.array([1.0, 2.0, 0.0])
    p2 = jnp.array([1.5, 3.0, 0.0])
    b1 = sensor.reveal_raycast(belief, truth, p1, 1.5, win)
    b12 = sensor.reveal_raycast(b1, truth, p2, 1.5, win)
    k1 = np.asarray(b1.data) >= 0
    k12 = np.asarray(b12.data) >= 0
    assert not np.any(k1 & ~k12)  # nothing un-revealed
    b11 = sensor.reveal_raycast(b1, truth, p1, 1.5, win)
    np.testing.assert_array_equal(np.asarray(b11.data), np.asarray(b1.data))
    # known cells always match truth
    t = np.asarray(truth.data)
    assert np.array_equal(np.asarray(b12.data)[k12], t[k12])


def test_raycast_batched_under_vmap_and_jit():
    truth, belief = _world()
    S = 3
    tb = jax.tree.map(lambda a: jnp.broadcast_to(a, (S,) + a.shape), truth)
    bb = jax.tree.map(lambda a: jnp.broadcast_to(a, (S,) + a.shape), belief)
    poses = jnp.asarray([[1.0, 2.0, 0.0], [4.0, 2.5, 1.0], [2.0, 4.5, -1.0]])
    win = sensor.raycast_window_cells(1.2, 0.1)
    f = jax.jit(jax.vmap(lambda b, t, x: sensor.reveal_raycast(b, t, x, 1.2, win)))
    out = f(bb, tb, poses)
    for i in range(S):
        ref = sensor.reveal_raycast(belief, truth, poses[i], 1.2, win)
        np.testing.assert_array_equal(np.asarray(out.data[i]), np.asarray(ref.data))


def test_explore_mapping_fused_matches_host_loop():
    """The fully on-device config-4 loop (one lax.scan: reveal -> MI refresh
    -> EDT world -> ticks) == the host-looped explore_mapping, same sensor."""
    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.engine import Engine

    cfg = default_config("cart").replace(
        num_basis=6, horizon=8, buffer_capacity=32, grid_samples=(20, 20))
    S = 2
    data = np.zeros((S, 30, 30), np.float32)
    data[:, 13:16, 5:22] = 1.0
    truth = GridMap(jnp.asarray(data), jnp.zeros((S, 2), jnp.float32),
                    jnp.full((S,), 0.05, jnp.float32))
    x0 = np.array([[0.4, 0.4, 0.5], [1.1, 1.1, -2.0]], np.float32)

    eng = Engine(cfg)
    sc_f, belief_f, cov_f, traj_f, em_f = eng.explore_mapping_fused(
        eng.init_scenarios(x0), truth, n_refreshes=3, refresh_every=5,
        sensor_range=0.5)
    out_h, belief_h, cov_h = Engine(cfg).explore_mapping(
        Engine(cfg).init_scenarios(x0), truth, n_ticks=15, refresh_every=5,
        sensor_range=0.5, sensor_model="raycast")

    assert traj_f.shape == (3, 5, S, 3)
    assert em_f.shape == (3, 5, S) and bool(np.isfinite(np.asarray(em_f)).all())
    np.testing.assert_array_equal(np.asarray(belief_f.data), np.asarray(belief_h.data))
    np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov_h), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(traj_f[-1, -1]), np.asarray(out_h.trajectory[-1]),
        rtol=2e-4, atol=2e-5)


def test_explore_mapping_raycast_keeps_hidden_side_unknown():
    """End-to-end config 4: with the ray-cast sensor, a robot on the left of
    a full-height wall must NOT reveal the right side."""
    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.engine import Engine

    cfg = default_config("cart").replace(
        num_basis=6, horizon=8, buffer_capacity=32, grid_samples=(20, 20))
    engine = Engine(cfg)
    S = 2
    data = np.zeros((S, 40, 40), np.float32)
    data[:, :, 19:21] = 1.0  # full-height vertical wall at x ~ 1 m
    truth = GridMap(jnp.asarray(data), jnp.zeros((S, 2), jnp.float32),
                    jnp.full((S,), 0.05, jnp.float32))
    x0 = np.array([[0.5, 0.5, 0.5], [0.5, 1.5, -0.5]])  # both on the left
    sc = engine.init_scenarios(x0)
    out, belief, coverage = engine.explore_mapping(
        sc, truth, n_ticks=20, sensor_range=0.6, refresh_every=10,
        sensor_model="raycast")
    b = np.asarray(belief.data)
    assert np.all(b[:, :, 25:] == -1.0), "saw through the wall"
    cov = np.asarray(coverage)
    assert cov[-1] > 0.0
    assert bool(jnp.all(jnp.isfinite(out.trajectory)))

"""MI-refresh Pallas kernel (ops/mi_kernel.py, interpret mode on CPU) ==
the XLA dense resample+contract path (engine._phik_grid_batch_dense_fn)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergodic_exploration_tpu.config import default_config
from ergodic_exploration_tpu.engine import Engine
from ergodic_exploration_tpu.grid import Domain, GridMap
from ergodic_exploration_tpu.ops.mi_kernel import phik_from_grid_pallas

pytestmark = pytest.mark.fused

DOM = Domain.create(0.0, 0.0, 2.0, 2.0)


def _grids(S=8, h=40, w=40):
    rng = np.random.default_rng(7)
    data = np.full((S, h, w), -1.0, dtype=np.float32)
    data[:, :, : w // 2] = 0.0  # observed-free half
    data[:, 10:14, 5:15] = 1.0  # a wall in the known half
    # scenario-varying extra observations + a noisy probabilistic band
    for s in range(S):
        r0 = rng.integers(0, h - 6)
        data[s, r0:r0 + 6, w // 2:w // 2 + 8] = rng.uniform(
            0.0, 1.0, (6, 8)).astype(np.float32)
    data[S - 1] = 1.0  # fully occupied -> degenerate fallback
    return GridMap(jnp.asarray(data), jnp.zeros((S, 2), jnp.float32),
                   jnp.full((S,), 0.05, jnp.float32))


@pytest.mark.parametrize("radius", [0, 2])
def test_mi_kernel_matches_dense_path(radius):
    grids = _grids()
    # 23x23 samples over 40 cells: no lattice point lands on an exact
    # half-cell boundary, where nearest-cell rounding is ulp-sensitive
    # to XLA fusion (the dense path itself shifts eager-vs-jit there)
    cfg = default_config("cart").replace(num_basis=6, grid_samples=(23, 23))
    eng = Engine(cfg)
    ref = jax.jit(
        lambda g: eng._phik_grid_batch_dense_fn(g, DOM, radius))(grids)

    g0 = jax.tree.map(lambda a: a[0], grids)
    out = jax.jit(
        lambda b: phik_from_grid_pallas(
            b, g0, DOM, cfg.num_basis, cfg.grid_samples,
            sensor_radius_cells=radius,
            frontier_cells=cfg.mi_frontier_cells))(grids.data)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_mi_kernel_full_tick_matches(radius=3):
    """replan_refresh_mi with the packed-belief kernel refresh == the dense
    XLA refresh, through the full fused tick."""
    S = 8
    grids = _grids(S)
    cfg = default_config("cart").replace(
        num_basis=6, grid_samples=(23, 23), buffer_capacity=64,
        use_fused_solve=True, shared_maps=True, shared_history_draw=True)
    eng = Engine(cfg)
    rng = np.random.default_rng(3)
    x0 = np.concatenate(
        [rng.uniform(0.3, 1.7, (S, 2)), rng.uniform(-3, 3, (S, 1))], axis=1
    ).astype(np.float32)
    # shared world (shared_maps contract): one map for all scenarios
    wdata = np.zeros((S, 40, 40), np.float32)
    wdata[:, 10:14, 5:15] = 1.0
    world = eng.prepare_world(GridMap(jnp.asarray(wdata),
                                      jnp.zeros((S, 2), jnp.float32),
                                      jnp.full((S,), 0.05, jnp.float32)))

    sc0 = eng.init_scenarios(x0)
    _, u_ref, d_ref = eng.replan_refresh_mi(
        sc0, grids, world, sensor_radius_cells=radius, domain=DOM)

    sc1 = eng.init_scenarios(x0)
    _, u_k, d_k = eng.replan_refresh_mi(
        sc1, grids, world, sensor_radius_cells=radius, domain=DOM,
        use_mi_kernel=True)
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-4, atol=5e-5)
    np.testing.assert_array_equal(np.asarray(d_k.collision_code),
                                  np.asarray(d_ref.collision_code))


def test_mi_kernel_padded_layout_matches_unpadded():
    """Round 5: beliefs carried in the lane-padded (S, h, 128) storage
    layout (arbitrary margin values) must produce BIT-identical phi_k — the
    true width comes from g0 and every matrix row/col beyond it is zero."""
    grids = _grids()
    cfg = default_config("cart").replace(num_basis=6, grid_samples=(23, 23))
    g0 = jax.tree.map(lambda a: a[0], grids)
    ref = jax.jit(lambda b: phik_from_grid_pallas(
        b, g0, DOM, cfg.num_basis, cfg.grid_samples,
        sensor_radius_cells=2, frontier_cells=3))(grids.data)
    rng = np.random.default_rng(0)
    S, h, w = grids.data.shape
    wp = -(-w // 128) * 128
    margin = rng.uniform(-1.0, 1.0, (S, h, wp - w)).astype(np.float32)
    padded = jnp.concatenate([grids.data, jnp.asarray(margin)], axis=-1)
    out = jax.jit(lambda b: phik_from_grid_pallas(
        b, g0, DOM, cfg.num_basis, cfg.grid_samples,
        sensor_radius_cells=2, frontier_cells=3))(padded)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_replan_refresh_mi_padded_data_matches():
    """engine.replan_refresh_mi with padded_data == the unpadded kernel
    path (what bench.py's MI metric rides)."""
    S = 8
    grids = _grids(S)
    cfg = default_config("cart").replace(
        num_basis=6, grid_samples=(23, 23), buffer_capacity=64)
    eng = Engine(cfg)
    rng = np.random.default_rng(1)
    x0 = np.concatenate(
        [rng.uniform(0.3, 1.7, (S, 2)), rng.uniform(-3, 3, (S, 1))], axis=1
    ).astype(np.float32)
    world = eng.prepare_world(grids)
    wp = -(-grids.data.shape[-1] // 128) * 128
    padded = jnp.pad(grids.data,
                     ((0, 0), (0, 0), (0, wp - grids.data.shape[-1])),
                     constant_values=1.0)
    outs = {}
    for p in (None, padded):
        sc = eng.init_scenarios(x0)
        sc, u, diag = eng.replan_refresh_mi(
            sc, grids, world, sensor_radius_cells=2, domain=DOM,
            use_mi_kernel=True, padded_data=p)
        outs[p is None] = np.asarray(u)
    np.testing.assert_array_equal(outs[False], outs[True])

"""GridMap / Domain tests: world<->grid transforms, ROS ingest, masks.

Mirrors the reference's gtest grid-index-transform tests (SURVEY.md sec. 5).
"""

import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.grid import Domain, GridMap


def test_world_grid_roundtrip():
    g = GridMap.create(jnp.zeros((10, 20)), x0=1.0, y0=-2.0, resolution=0.5)
    idx = jnp.array([3.0, 7.0])  # (ix, iy)
    p = g.grid_to_world(idx)
    np.testing.assert_allclose(np.asarray(p), [1.0 + 3.5 * 0.5, -2.0 + 7.5 * 0.5], atol=1e-6)
    back = g.world_to_grid(p)
    np.testing.assert_allclose(np.asarray(back), [3.0, 7.0], atol=1e-5)


def test_cell_index_clamps_to_map():
    g = GridMap.create(jnp.zeros((10, 20)), resolution=0.1)
    ij = g.cell_index(jnp.array([100.0, -100.0]))
    assert tuple(np.asarray(ij)) == (19, 0)


def test_from_ros_conversion():
    raw = np.array([[-1, 0], [50, 100]], dtype=np.int8)
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.05)
    data = np.asarray(g.data)
    assert data[0, 0] == -1.0
    np.testing.assert_allclose(data[0, 1], 0.0)
    np.testing.assert_allclose(data[1, 0], 0.5)
    np.testing.assert_allclose(data[1, 1], 1.0)
    known = np.asarray(g.known())
    assert not known[0, 0] and known[1, 1]
    assert np.asarray(g.occupied(0.65))[1, 1]
    assert not np.asarray(g.occupied(0.65))[0, 0]  # unknown is not an obstacle


def test_occupancy_at_world_points():
    raw = np.zeros((4, 4), dtype=np.int8)
    raw[2, 1] = 100
    g = GridMap.from_ros(raw, 0.0, 0.0, 1.0)
    # cell (ix=1, iy=2) center is (1.5, 2.5)
    assert float(g.occupancy_at(jnp.array([1.5, 2.5]))) == 1.0
    assert float(g.occupancy_at(jnp.array([0.5, 0.5]))) == 0.0


def test_domain_from_map_and_lattice():
    g = GridMap.create(jnp.zeros((10, 20)), x0=1.0, y0=2.0, resolution=0.5)
    d = g.domain()
    np.testing.assert_allclose(np.asarray(d.lengths), [10.0, 5.0], atol=1e-6)
    pts = d.sample_lattice((8, 4))
    assert pts.shape == (32, 2)
    assert bool(jnp.all(d.contains(pts)))
    # cell-centered: first sample strictly inside
    np.testing.assert_allclose(np.asarray(pts[0]), [1.0 + 10.0 / 16, 2.0 + 5.0 / 8], atol=1e-5)


def test_domain_contains():
    d = Domain.create(0.0, 0.0, 2.0, 3.0)
    assert bool(d.contains(jnp.array([1.0, 1.0])))
    assert not bool(d.contains(jnp.array([2.1, 1.0])))
    assert not bool(d.contains(jnp.array([1.0, -0.1])))

"""Distance-transform tests: exact EDT vs brute-force oracle + field queries."""

import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.grid import GridMap
from ergodic_exploration_tpu.ops.distance import FAR, DistanceField, edt

import oracle

RNG = np.random.default_rng(5)


def test_edt_matches_bruteforce_oracle():
    for _ in range(3):
        occ = RNG.uniform(size=(12, 17)) < 0.1
        if not occ.any():
            occ[3, 4] = True
        got = np.asarray(edt(jnp.asarray(occ), 0.25))
        want = oracle.exact_edt(occ, 0.25)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_edt_empty_map_is_far():
    d = np.asarray(edt(jnp.zeros((6, 6), bool), 0.1))
    assert (d >= FAR).all()


def test_field_query_interpolates():
    raw = np.zeros((20, 20), dtype=np.int8)
    raw[10, 10] = 100
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    f = DistanceField.from_grid(g)
    # obstacle cell center is (1.05, 1.05); query 0.5 m to its left
    d, grad = f.query(jnp.array([0.55, 1.05]))
    np.testing.assert_allclose(float(d), 0.5, atol=0.02)
    # clearance increases moving away from the obstacle: grad points -x
    assert float(grad[0]) < -0.8
    np.testing.assert_allclose(float(grad[1]), 0.0, atol=0.1)


def test_field_gradient_unit_magnitude_near_obstacle():
    raw = np.zeros((30, 30), dtype=np.int8)
    raw[:, 0] = 100  # wall at left edge
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    f = DistanceField.from_grid(g)
    d, grad = f.query(jnp.array([1.5, 1.5]))
    np.testing.assert_allclose(float(d), 1.5 - 0.05, atol=0.02)
    np.testing.assert_allclose(float(grad[0]), 1.0, atol=0.05)


def test_empty_field_far_and_zero_grad():
    f = DistanceField.empty((4, 4), resolution=0.5)
    d, grad = f.query(jnp.array([0.7, 0.9]))
    assert float(d) >= FAR * 0.9
    np.testing.assert_allclose(np.asarray(grad), 0.0)


def test_field_batched_query():
    raw = np.zeros((16, 16), dtype=np.int8)
    raw[8, 8] = 100
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    f = DistanceField.from_grid(g)
    pts = jnp.asarray(RNG.uniform(0.2, 1.4, size=(7, 5, 2)), jnp.float32)
    d, grad = f.query(pts)
    assert d.shape == (7, 5) and grad.shape == (7, 5, 2)

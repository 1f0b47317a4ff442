"""Barrier tests: oracle parity + autodiff consistency + activation regions."""

import jax
import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.config import default_config
from ergodic_exploration_tpu.grid import Domain, GridMap
from ergodic_exploration_tpu.ops.barrier import barrier, boundary_barrier, obstacle_barrier
from ergodic_exploration_tpu.ops.distance import DistanceField

import oracle

DOM = Domain.create(0.0, 0.0, 3.0, 2.0)


def test_boundary_barrier_zero_inside():
    p = jnp.array([[1.5, 1.0], [0.2, 0.2]])
    val, grad = boundary_barrier(p, DOM, eps=0.1, weight=10.0)
    np.testing.assert_allclose(np.asarray(val), 0.0)
    np.testing.assert_allclose(np.asarray(grad), 0.0)


def test_boundary_barrier_grad_matches_oracle():
    for p in ([3.05, 1.0], [-0.2, 0.15], [2.95, 2.2]):
        _, grad = boundary_barrier(jnp.asarray(p, jnp.float32), DOM, eps=0.1, weight=10.0)
        want = oracle.boundary_barrier_grad(np.asarray(p), [0.0, 0.0], [3.0, 2.0], 0.1, 10.0)
        np.testing.assert_allclose(np.asarray(grad), want, atol=1e-4)


def test_boundary_barrier_grad_matches_autodiff():
    def val(p):
        v, _ = boundary_barrier(p, DOM, eps=0.1, weight=10.0)
        return v

    for p in ([3.2, 1.0], [0.02, -0.1]):
        pj = jnp.asarray(p, jnp.float32)
        _, grad = boundary_barrier(pj, DOM, eps=0.1, weight=10.0)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(jax.grad(val)(pj)), atol=1e-4)


def test_obstacle_barrier_matches_oracle_and_vanishes():
    for clearance in (0.25, 0.4, 0.8, 2.0):
        v, g = obstacle_barrier(
            jnp.asarray(clearance, jnp.float32),
            jnp.array([1.0, 0.0]),
            boundary_radius=0.2,
            d_safe=0.5,
            weight=0.05,
        )
        want = oracle.obstacle_barrier_value(clearance - 0.2, 0.5, 0.05, 0.03)
        np.testing.assert_allclose(float(v), want, rtol=1e-4, atol=1e-7)
    assert float(v) == 0.0  # clearance=2.0 is beyond d_safe


def test_obstacle_barrier_pushes_away_from_obstacle():
    """Wall on the left: the descent direction -grad must point +x (away)."""
    raw = np.zeros((20, 20), dtype=np.int8)
    raw[:, 0] = 100
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    f = DistanceField.from_grid(g)
    cfg = default_config("cart")
    p = jnp.array([[0.3, 1.0]])  # inside the d_safe band
    val, grad = barrier(p, g.domain(), f, cfg)
    assert float(val[0]) > 0.0
    assert float(grad[0, 0]) < 0.0  # cost decreases as x increases -> grad_x < 0


def test_combined_barrier_zero_in_open_space():
    cfg = default_config("cart")
    f = DistanceField.empty((4, 4))
    p = jnp.array([[1.5, 1.0]])
    val, grad = barrier(p, DOM, f, cfg)
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-8)

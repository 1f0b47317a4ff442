"""Collision checking of poses and short-horizon trajectories.

Reference capability: ``Collision::collisionCheck`` -> enum {none, obstacle,
crash} and the emitted-control validation loop (simulate u0 for val_horizon
steps at val_dt; a collision routes control to the DWA fallback) — SURVEY.md
sections 2 L1, 3, 4.2 step "validate", and A.7.

Build-side: checks are clearance gathers against the per-map distance field
(plus a domain-containment test), returned as int codes so the batched
controller can ``jnp.where``-select between the ergodic and DWA controls
without divergence.
"""

from __future__ import annotations

import jax.numpy as jnp


# collision codes (reference enum parity)
NONE = 0
OBSTACLE = 1  # within d_safe of an obstacle (warning band)
CRASH = 2  # footprint overlaps an obstacle or leaves the domain


def check_pose(p, domain, dist_field, boundary_radius: float, d_safe: float):
    """Collision code (int32) for positions (..., 2).

    Uses the nearest-cell clearance gather (cell-quantized, matching the
    reference's Bresenham cell search) — 1 gather/point on the hot path."""
    clearance = dist_field.query_dist(p)
    d = clearance - boundary_radius
    inside = domain.contains(p)
    crash = (~inside) | (d <= 0.0)
    warn = d < d_safe
    return jnp.where(crash, CRASH, jnp.where(warn, OBSTACLE, NONE)).astype(jnp.int32)


def check_trajectory(P, domain, dist_field, boundary_radius: float, d_safe: float):
    """Worst collision code along a trajectory of positions (T, 2)."""
    codes = check_pose(P, domain, dist_field, boundary_radius, d_safe)
    return jnp.max(codes)


def validate_control(model, x, u, domain, dist_field, cfg):
    """Reference A.7: hold u for val_horizon steps of val_dt and check.

    Returns the worst collision code (int32) along the simulated path —
    CRASH means the ergodic control must be replaced by the DWA fallback.

    A constant control is a constant body twist, so the path comes from the
    exact closed-form arc (one vectorized op) instead of a sequential RK4
    scan — identical semantics, no serial bottleneck.
    """
    from ergodic_exploration_tpu.ops.integrator import constant_twist_poses

    ts = cfg.val_dt * jnp.arange(1, cfg.val_horizon + 1, dtype=jnp.float32)
    X = constant_twist_poses(x, model.twist(u), ts)  # (val_horizon, 3)
    return check_trajectory(X[..., :2], domain, dist_field, cfg.boundary_radius, cfg.d_safe)

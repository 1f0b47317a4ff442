"""Barrier costs: domain-boundary walls + obstacle-proximity penalties.

Reference capability: the barrier/collision cost inside
``ErgodicControl::gradBarrier`` — domain-boundary barriers plus
obstacle-proximity penalties whose direction comes from
``Collision::minDirection`` (SURVEY.md sections 2 L3, 4.2, and A.5).

Build-side form (SURVEY.md A.5, with the Bresenham search replaced by the
distance-field gather from :mod:`ergodic_exploration_tpu.ops.distance`):

    boundary:  b(p) = w_b * sum_i [ relu(p_i - (hi_i - eps))^2
                                  + relu((lo_i + eps) - p_i)^2 ]
    obstacle:  c(d) = w_o * (1/d - 1/d_safe)^2   for d < d_safe, else 0,
               with d = clearance - boundary_radius clamped to d_min > 0;
               grad_p c = c'(d) * grad_p d  (grad_p d from the EDT field).

Everything is branch-free (masked), so it vectorizes across knots and
scenarios.
"""

from __future__ import annotations

import jax.numpy as jnp


def boundary_barrier(p, domain, eps: float, weight: float):
    """Value (...,) and gradient (..., 2) of the boundary barrier."""
    lo = domain.origin + eps
    hi = domain.origin + domain.lengths - eps
    over = jnp.maximum(p - hi, 0.0)
    under = jnp.maximum(lo - p, 0.0)
    val = weight * jnp.sum(over**2 + under**2, axis=-1)
    grad = 2.0 * weight * (over - under)
    return val, grad


def obstacle_barrier(clearance, clearance_grad, boundary_radius: float, d_safe: float,
                     weight: float, d_min: float = 0.03):
    """Value (...,) and gradient (..., 2) of the obstacle-proximity barrier.

    ``clearance``/``clearance_grad`` come from ``DistanceField.query`` at the
    query positions. ``boundary_radius`` is the robot footprint radius: the
    barrier acts on d = clearance - footprint.
    """
    d = jnp.maximum(clearance - boundary_radius, d_min)
    active = d < d_safe
    diff = jnp.where(active, 1.0 / d - 1.0 / d_safe, 0.0)
    val = weight * diff**2
    # dc/dd = -2 w (1/d - 1/d_safe) / d^2 ; chain through grad_p(clearance)
    dval_dd = jnp.where(active, -2.0 * weight * diff / (d * d), 0.0)
    grad = dval_dd[..., None] * clearance_grad
    return val, grad


def barrier(p, domain, dist_field, cfg):
    """Combined barrier value (...,) and gradient (..., 2) at positions p.

    ``cfg`` is an EngineConfig (barrier_* fields, boundary_radius, d_safe).
    """
    bv, bg = boundary_barrier(p, domain, cfg.barrier_eps, cfg.barrier_boundary_weight)
    clearance, cgrad = dist_field.query(p)
    ov, og = obstacle_barrier(
        clearance, cgrad, cfg.boundary_radius, cfg.d_safe, cfg.barrier_obstacle_weight
    )
    return bv + ov, bg + og

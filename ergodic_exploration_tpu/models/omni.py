"""Omni-directional (mecanum) kinematics.

Reference capability: the ``Omni`` functor (``omni.hpp``): 4 mecanum-wheel
velocities -> body twist via the standard mixing matrix, rotated into the
world frame; B is (3 x 4) (SURVEY.md sections 2 L2, 3, and A.2).

Wheel order (u1..u4) = (front-left, front-right, rear-left, rear-right),
X-configuration rollers; L = lx + ly:
    vx    = (r/4)( u1 + u2 + u3 + u4)
    vy    = (r/4)(-u1 + u2 + u3 - u4)
    omega = (r/(4L))(-u1 + u2 - u3 + u4)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ergodic_exploration_tpu.models.base import rotate_body_to_world

# mixing-matrix sign rows for (vx, vy, omega)
_SX = (1.0, 1.0, 1.0, 1.0)
_SY = (-1.0, 1.0, 1.0, -1.0)
_SW = (-1.0, 1.0, -1.0, 1.0)


@dataclass(frozen=True)
class Omni:
    wheel_radius: float = 0.0505
    lx: float = 0.28
    ly: float = 0.2665

    nu: int = 4

    def twist(self, u):
        """Wheel velocities -> body twist (vx, vy, omega)."""
        r = self.wheel_radius
        L = self.lx + self.ly
        sx = jnp.asarray(_SX, dtype=u.dtype)
        sy = jnp.asarray(_SY, dtype=u.dtype)
        sw = jnp.asarray(_SW, dtype=u.dtype)
        vx = 0.25 * r * jnp.sum(u * sx, axis=-1)
        vy = 0.25 * r * jnp.sum(u * sy, axis=-1)
        w = (0.25 * r / L) * jnp.sum(u * sw, axis=-1)
        return jnp.stack([vx, vy, w], axis=-1)

    def from_twist(self, tw):
        """Body twist -> wheel velocities (exact inverse kinematics)."""
        r = self.wheel_radius
        L = self.lx + self.ly
        vx, vy, w = tw[..., 0], tw[..., 1], tw[..., 2]
        u1 = (vx - vy - L * w) / r
        u2 = (vx + vy + L * w) / r
        u3 = (vx + vy - L * w) / r
        u4 = (vx - vy + L * w) / r
        return jnp.stack([u1, u2, u3, u4], axis=-1)

    def f(self, x, u):
        tw = self.twist(u)
        th = x[..., 2]
        wx, wy = rotate_body_to_world(th, tw[..., 0], tw[..., 1])
        return jnp.stack([wx, wy, tw[..., 2]], axis=-1)

    def A(self, x, u):
        """df/dx: only the theta column is nonzero."""
        tw = self.twist(u)
        th = x[..., 2]
        c, s = jnp.cos(th), jnp.sin(th)
        vx, vy = tw[..., 0], tw[..., 1]
        z = jnp.zeros_like(th)
        row0 = jnp.stack([z, z, -vx * s - vy * c], axis=-1)
        row1 = jnp.stack([z, z, vx * c - vy * s], axis=-1)
        row2 = jnp.stack([z, z, z], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    def B(self, x, u=None):
        """df/du: per-wheel body contribution rotated by theta; (..., 3, 4)."""
        r = self.wheel_radius
        L = self.lx + self.ly
        th = x[..., 2]
        c, s = jnp.cos(th), jnp.sin(th)
        dtype = jnp.asarray(th).dtype
        sx = 0.25 * r * jnp.asarray(_SX, dtype=dtype)
        sy = 0.25 * r * jnp.asarray(_SY, dtype=dtype)
        sw = (0.25 * r / L) * jnp.asarray(_SW, dtype=dtype)
        row0 = c[..., None] * sx - s[..., None] * sy
        row1 = s[..., None] * sx + c[..., None] * sy
        row2 = jnp.broadcast_to(sw, row0.shape)
        return jnp.stack([row0, row1, row2], axis=-2)

"""Differential-drive ("cart") kinematics.

Reference capability: the ``Cart`` functor (``cart.hpp``): wheel velocities
(u_L, u_R) -> world-frame state rates, with hand-written Jacobians ``fdx``
(A) and ``fdu`` (B), and wheel-vel<->twist conversion (SURVEY.md sections 2
L2, 3, and A.2).

Kinematics (wheel radius r, wheel base b):
    v     = (r/2)(u_L + u_R)          forward speed
    omega = (r/b)(u_R - u_L)          yaw rate
    xdot  = (v cos th, v sin th, omega)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Cart:
    wheel_radius: float = 0.033
    wheel_base: float = 0.16

    nu: int = 2

    def _vw(self, u):
        r, b = self.wheel_radius, self.wheel_base
        v = 0.5 * r * (u[..., 0] + u[..., 1])
        w = (r / b) * (u[..., 1] - u[..., 0])
        return v, w

    def f(self, x, u):
        v, w = self._vw(u)
        th = x[..., 2]
        return jnp.stack([v * jnp.cos(th), v * jnp.sin(th), w], axis=-1)

    def A(self, x, u):
        """df/dx: only the theta column is nonzero (SURVEY.md A.2)."""
        v, _ = self._vw(u)
        th = x[..., 2]
        z = jnp.zeros_like(v)
        row0 = jnp.stack([z, z, -v * jnp.sin(th)], axis=-1)
        row1 = jnp.stack([z, z, v * jnp.cos(th)], axis=-1)
        row2 = jnp.stack([z, z, z], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    def B(self, x, u=None):
        """df/du: the wheel map rotated into the world frame by theta."""
        r, b = self.wheel_radius, self.wheel_base
        th = x[..., 2]
        c, s = jnp.cos(th), jnp.sin(th)
        hr = 0.5 * r
        rb = r / b
        row0 = jnp.stack([hr * c, hr * c], axis=-1)
        row1 = jnp.stack([hr * s, hr * s], axis=-1)
        row2 = jnp.stack([-rb * jnp.ones_like(th), rb * jnp.ones_like(th)], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    def twist(self, u):
        """Wheel velocities -> body twist (vx, 0, omega)."""
        v, w = self._vw(u)
        return jnp.stack([v, jnp.zeros_like(v), w], axis=-1)

    def from_twist(self, tw):
        """Body twist -> wheel velocities; vy is unrealizable and ignored."""
        r, b = self.wheel_radius, self.wheel_base
        vx, w = tw[..., 0], tw[..., 2]
        ul = (vx - 0.5 * b * w) / r
        ur = (vx + 0.5 * b * w) / r
        return jnp.stack([ul, ur], axis=-1)

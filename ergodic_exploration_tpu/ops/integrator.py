"""RK4 integration: forward trajectory rollout and backward co-state pass.

Reference capability: ``RungeKutta`` (``integrator.hpp``): single ``step``,
full-horizon ``solve`` producing a (3 x N) trajectory, and the backward
co-state ``step``/``solve`` taking the rho-dot closure (SURVEY.md sections 2
L2 and 4.2).

TPU-first redesign: both passes are ``lax.scan`` bodies with tiny carries
(one state / one co-state vector), so XLA keeps the sequential loop entirely
on-chip and the batch dimension (thousands of scenarios, via vmap/shard_map
outside) provides the parallelism — per SURVEY.md section 8's "hard parts",
throughput comes from the scenario batch, not from inside a solve.

Discretization contract (shared with the NumPy oracle in tests/oracle.py):
- rollout: X = [x_0 .. x_H], x_{t+1} = RK4(f, x_t, u_t, dt), heading wrapped
  to (-pi, pi] after each step.
- co-state: rho_H = 0; for t = H-1 .. 0, rho_t integrates
  rho_dot = -g_t - A_t^T rho backward over one step of length dt with A_t,
  g_t held constant on the step (the reference evaluates its closures at the
  stored trajectory knots, i.e. the same piecewise-constant treatment).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergodic_exploration_tpu.utils.numerics import wrap_state_angle


def rk4_step(f, x, u, dt):
    """One classical RK4 step of xdot = f(x, u) with u held constant."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rollout(model, x0, U, dt):
    """Forward-simulate a control sequence.

    Args:
        model: a KinematicModel.
        x0: (3,) initial state.
        U: (H, nu) control sequence.
        dt: step size.

    Returns:
        X: (H+1, 3) states [x_0 .. x_H] with wrapped headings.
    """

    def body(x, u):
        x_next = wrap_state_angle(rk4_step(model.f, x, u, dt))
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, U)
    return jnp.concatenate([x0[None, :], xs], axis=0)


def costate_rk4_step(rho, A, g, dt):
    """Integrate rho_dot = -g - A^T rho backward over one step of length dt.

    Backward integration of the forward-time ODE: with s = T - t,
    d(rho)/ds = +g + A^T rho; RK4 on that frozen-coefficient linear ODE.
    """

    def fdot(r):
        return g + A.T @ r

    k1 = fdot(rho)
    k2 = fdot(rho + 0.5 * dt * k1)
    k3 = fdot(rho + 0.5 * dt * k2)
    k4 = fdot(rho + dt * k3)
    return rho + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def costate_solve(As, gs, dt):
    """Backward co-state sweep over a horizon.

    Args:
        As: (H, 3, 3) state Jacobians at the trajectory knots.
        gs: (H, 3) running-cost gradients (gamma * ergodic + barrier) at knots.
        dt: step size.

    Returns:
        rhos: (H, 3) co-states [rho_0 .. rho_{H-1}] with rho_H = 0 implicit.
    """

    def body(rho, inputs):
        A, g = inputs
        rho_prev = costate_rk4_step(rho, A, g, dt)
        return rho_prev, rho_prev

    rho_T = jnp.zeros(As.shape[-1], dtype=As.dtype)
    # reverse=True consumes t = H-1 .. 0 but stacks outputs at their input
    # positions, so `rhos` is already [rho_0 .. rho_{H-1}].
    _, rhos = jax.lax.scan(body, rho_T, (As, gs), reverse=True)
    return rhos

"""Integrator tests: RK4 order-4 convergence, oracle parity, co-state parity.

Mirrors the reference's gtest integrator-accuracy tests and adds the
property tests from SURVEY.md section 5 item 2.
"""

import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.models import Cart
from ergodic_exploration_tpu.ops.integrator import costate_solve, rk4_step, rollout

import oracle


def test_rk4_order4_convergence_on_analytic_flow():
    """xdot = -2x has solution e^{-2t}; RK4 global error should scale ~h^4.

    Step counts stay coarse (2/4/8) so truncation error stays well above
    fp32 roundoff, where the order is actually measurable.
    """

    def f(x, u):
        return -2.0 * x

    x0 = jnp.array([1.0])
    errs = []
    for n in (2, 4, 8):
        dt = 1.0 / n
        x = x0
        for _ in range(n):
            x = rk4_step(f, x, None, dt)
        errs.append(abs(float(x[0]) - np.exp(-2.0)))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate1 > 3.5 and rate2 > 3.5


def test_rollout_matches_oracle_cart():
    rng = np.random.default_rng(1)
    m = Cart(wheel_radius=0.04, wheel_base=0.2)
    x0 = np.array([0.5, 0.5, 0.3])
    U = rng.uniform(-5, 5, size=(20, 2))
    X = np.asarray(rollout(m, jnp.asarray(x0, jnp.float32), jnp.asarray(U, jnp.float32), 0.1))
    Xo = oracle.rollout(lambda x, u: oracle.cart_f(x, u, 0.04, 0.2), x0, U, 0.1)
    assert X.shape == (21, 3)
    np.testing.assert_allclose(X, Xo, atol=1e-4)


def test_rollout_wraps_heading():
    m = Cart()
    x0 = jnp.array([0.0, 0.0, 3.0])
    U = jnp.tile(jnp.array([[-5.0, 5.0]]), (50, 1))  # spin in place
    X = rollout(m, x0, U, 0.1)
    assert bool(jnp.all(jnp.abs(X[:, 2]) <= np.pi + 1e-6))


def test_costate_matches_oracle():
    rng = np.random.default_rng(2)
    H = 20
    As = rng.normal(size=(H, 3, 3)) * 0.3
    gs = rng.normal(size=(H, 3))
    got = np.asarray(costate_solve(jnp.asarray(As, jnp.float32), jnp.asarray(gs, jnp.float32), 0.1))
    want = oracle.costate_solve(As, gs, 0.1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_costate_zero_gradient_gives_zero_costate():
    As = jnp.zeros((10, 3, 3))
    gs = jnp.zeros((10, 3))
    rhos = costate_solve(As, gs, 0.1)
    np.testing.assert_allclose(np.asarray(rhos), 0.0)

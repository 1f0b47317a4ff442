"""Model tests: oracle parity + closed-form Jacobians vs jax.jacfwd.

Mirrors the reference's gtest coverage of model Jacobians vs finite
differences (SURVEY.md section 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergodic_exploration_tpu.models import Cart, Omni

import oracle

RNG = np.random.default_rng(0)


def _rand_states(n):
    x = RNG.uniform(-2, 2, size=(n, 3))
    x[:, 2] = RNG.uniform(-np.pi, np.pi, size=n)
    return x


@pytest.mark.parametrize("seed", range(3))
def test_cart_f_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    m = Cart(wheel_radius=0.04, wheel_base=0.2)
    for _ in range(10):
        x = rng.uniform(-3, 3, 3)
        u = rng.uniform(-5, 5, 2)
        got = np.asarray(m.f(jnp.asarray(x), jnp.asarray(u)))
        want = oracle.cart_f(x, u, 0.04, 0.2)
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("seed", range(3))
def test_omni_f_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    m = Omni(wheel_radius=0.05, lx=0.3, ly=0.25)
    for _ in range(10):
        x = rng.uniform(-3, 3, 3)
        u = rng.uniform(-5, 5, 4)
        got = np.asarray(m.f(jnp.asarray(x), jnp.asarray(u)))
        want = oracle.omni_f(x, u, 0.05, 0.3, 0.25)
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("model", [Cart(), Omni()])
def test_closed_form_jacobians_match_autodiff(model):
    for i in range(5):
        x = jnp.asarray(_rand_states(1)[0], dtype=jnp.float32)
        u = jnp.asarray(RNG.uniform(-4, 4, model.nu), dtype=jnp.float32)
        A_ad = jax.jacfwd(lambda x_: model.f(x_, u))(x)
        B_ad = jax.jacfwd(lambda u_: model.f(x, u_))(u)
        np.testing.assert_allclose(np.asarray(model.A(x, u)), np.asarray(A_ad), atol=1e-5)
        np.testing.assert_allclose(np.asarray(model.B(x, u)), np.asarray(B_ad), atol=1e-5)


@pytest.mark.parametrize("model", [Cart(), Omni()])
def test_twist_roundtrip(model):
    """from_twist(twist(u)) recovers u for realizable twists; twist(from_twist(v)) = v."""
    if model.nu == 2:
        tw = jnp.array([0.3, 0.0, 0.7])
    else:
        tw = jnp.array([0.3, -0.2, 0.7])
    u = model.from_twist(tw)
    np.testing.assert_allclose(np.asarray(model.twist(u)), np.asarray(tw), atol=1e-6)


def test_models_broadcast_over_batches():
    m = Omni()
    x = jnp.zeros((7, 5, 3))
    u = jnp.ones((7, 5, 4))
    assert m.f(x, u).shape == (7, 5, 3)
    assert m.A(x, u).shape == (7, 5, 3, 3)
    assert m.B(x, u).shape == (7, 5, 3, 4)
    assert m.twist(u).shape == (7, 5, 3)

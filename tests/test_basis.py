"""Basis tests: separable-matmul formulation vs the dense NumPy oracle, and
the ergodic gradient vs autodiff of the metric."""

import jax
import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.grid import Domain
from ergodic_exploration_tpu.ops import basis

import oracle

K = 6
DOM = Domain.create(-1.0, 0.5, 4.0, 3.0)
ORIGIN = np.array([-1.0, 0.5])
LENGTHS = np.array([4.0, 3.0])
RNG = np.random.default_rng(3)


def _rand_points(n):
    return ORIGIN + RNG.uniform(0, 1, size=(n, 2)) * LENGTHS


def test_lambda_weights_match_oracle():
    np.testing.assert_allclose(np.asarray(basis.lambda_weights(K)), oracle.lambda_k(K), atol=1e-6)


def test_hk_matches_oracle():
    hk = basis.hk_norm(K, DOM.lengths)
    np.testing.assert_allclose(np.asarray(hk), oracle.basis_hk(K, *LENGTHS), atol=1e-5)


def test_dense_basis_matches_oracle():
    pts = _rand_points(5)
    tbl = basis.tables(jnp.asarray(pts, jnp.float32), K, DOM)
    hk = basis.hk_norm(K, DOM.lengths)
    F = np.asarray(basis.fourier_basis_at(tbl, hk))
    for i, p in enumerate(pts):
        np.testing.assert_allclose(F[i], oracle.fourier_basis(p, K, ORIGIN, LENGTHS), atol=1e-4)


def test_coefficients_match_oracle():
    pts = _rand_points(40)
    w = RNG.uniform(0.1, 1.0, 40)
    wn = w / w.sum()
    tbl = basis.tables(jnp.asarray(pts, jnp.float32), K, DOM)
    hk = basis.hk_norm(K, DOM.lengths)
    ck = np.asarray(basis.coefficients(tbl, jnp.asarray(wn, jnp.float32), hk))
    want = oracle.trajectory_coefficients(pts, K, ORIGIN, LENGTHS, weights=w)
    np.testing.assert_allclose(ck, want, atol=1e-4)


def test_ergodic_gradient_matches_oracle():
    pts = _rand_points(15)
    phi_pts = _rand_points(50)
    phi_vals = RNG.uniform(0.1, 1, 50)
    phik = oracle.spatial_coefficients(phi_vals, phi_pts, K, ORIGIN, LENGTHS)
    M = 25  # pretend history of 10 extra states
    ck = oracle.trajectory_coefficients(pts, K, ORIGIN, LENGTHS)
    tbl = basis.tables(jnp.asarray(pts, jnp.float32), K, DOM)
    hk = basis.hk_norm(K, DOM.lengths)
    lam = basis.lambda_weights(K)
    got = np.asarray(
        basis.ergodic_gradient(tbl, jnp.asarray(ck, jnp.float32), jnp.asarray(phik, jnp.float32), lam, hk, M)
    )
    want = oracle.ergodic_gradient(pts, ck, phik, K, ORIGIN, LENGTHS, M)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ergodic_gradient_matches_autodiff():
    """Independent check: grad matches jax.grad of E(points) where c_k is the
    plain mean of F_k over the same points (M = N, no history)."""
    pts = jnp.asarray(_rand_points(12), jnp.float32)
    phik = jnp.asarray(RNG.normal(size=(K, K)) * 0.05, jnp.float32)
    hk = basis.hk_norm(K, DOM.lengths)
    lam = basis.lambda_weights(K)

    def metric(points):
        tbl = basis.tables(points, K, DOM)
        n = points.shape[0]
        ck = basis.coefficients(tbl, jnp.full((n,), 1.0 / n), hk)
        return basis.ergodic_metric(ck, phik, lam)

    g_ad = jax.grad(metric)(pts)
    tbl = basis.tables(pts, K, DOM)
    ck = basis.coefficients(tbl, jnp.full((12,), 1.0 / 12.0), hk)
    g = basis.ergodic_gradient(tbl, ck, phik, lam, hk, 12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-5)


def test_metric_zero_when_ck_equals_phik():
    phik = jnp.asarray(RNG.normal(size=(K, K)), jnp.float32)
    lam = basis.lambda_weights(K)
    assert float(basis.ergodic_metric(phik, phik, lam)) == 0.0

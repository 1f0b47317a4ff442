"""Independent NumPy oracle for every formula in SURVEY.md Appendix A.

Written deliberately from the math (not from the JAX code) so it can catch
transcription errors in the jitted kernels — SURVEY.md section 5 item 1. Slow
scalar/loop style is intentional: clarity over speed.
"""

from __future__ import annotations

import numpy as np


def normalize_angle(theta):
    return np.pi - np.mod(np.pi - theta, 2.0 * np.pi)


# ----------------------------------------------------------------------------
# A.2 models
# ----------------------------------------------------------------------------


def cart_f(x, u, r, b):
    v = 0.5 * r * (u[0] + u[1])
    w = (r / b) * (u[1] - u[0])
    return np.array([v * np.cos(x[2]), v * np.sin(x[2]), w])


def omni_f(x, u, r, lx, ly):
    L = lx + ly
    vx = 0.25 * r * (u[0] + u[1] + u[2] + u[3])
    vy = 0.25 * r * (-u[0] + u[1] + u[2] - u[3])
    w = (0.25 * r / L) * (-u[0] + u[1] - u[2] + u[3])
    c, s = np.cos(x[2]), np.sin(x[2])
    return np.array([vx * c - vy * s, vx * s + vy * c, w])


def numeric_jacobian(fn, z, eps=1e-6):
    z = np.asarray(z, dtype=np.float64)
    f0 = fn(z)
    J = np.zeros((f0.size, z.size))
    for i in range(z.size):
        dz = z.copy()
        dz[i] += eps
        J[:, i] = (fn(dz) - f0) / eps
    return J


# ----------------------------------------------------------------------------
# RK4 forward rollout + backward co-state (integrator contract)
# ----------------------------------------------------------------------------


def rk4_step(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rollout(f, x0, U, dt):
    X = [np.asarray(x0, dtype=np.float64)]
    for u in U:
        xn = rk4_step(f, X[-1], u, dt)
        xn[2] = normalize_angle(xn[2])
        X.append(xn)
    return np.stack(X)


def costate_solve(As, gs, dt):
    """rho_H = 0; backward RK4 on rho_dot = -g - A^T rho, frozen per step."""
    H = len(As)
    rho = np.zeros(3)
    rhos = np.zeros((H, 3))
    for t in range(H - 1, -1, -1):
        A, g = As[t], gs[t]

        def fdot(r):
            return g + A.T @ r

        k1 = fdot(rho)
        k2 = fdot(rho + 0.5 * dt * k1)
        k3 = fdot(rho + 0.5 * dt * k2)
        k4 = fdot(rho + dt * k3)
        rho = rho + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        rhos[t] = rho
    return rhos


# ----------------------------------------------------------------------------
# A.1 / A.3 Fourier basis, coefficients, ergodic metric & gradient
# ----------------------------------------------------------------------------


def basis_hk(K, Lx, Ly):
    """Normalization h_k with c(0)=1, c(k>0)=1/2 so ||F_k||_L2 = 1."""
    h = np.zeros((K, K))
    for k1 in range(K):
        for k2 in range(K):
            c1 = 1.0 if k1 == 0 else 0.5
            c2 = 1.0 if k2 == 0 else 0.5
            h[k1, k2] = np.sqrt(Lx * Ly * c1 * c2)
    return h


def fourier_basis(p, K, origin, lengths):
    """F_k(p) for one point p=(x,y): (K, K) array."""
    Lx, Ly = lengths
    x = p[0] - origin[0]
    y = p[1] - origin[1]
    h = basis_hk(K, Lx, Ly)
    F = np.zeros((K, K))
    for k1 in range(K):
        for k2 in range(K):
            F[k1, k2] = np.cos(k1 * np.pi * x / Lx) * np.cos(k2 * np.pi * y / Ly) / h[k1, k2]
    return F


def grad_fourier_basis(p, K, origin, lengths):
    """grad F_k(p): (K, K, 2)."""
    Lx, Ly = lengths
    x = p[0] - origin[0]
    y = p[1] - origin[1]
    h = basis_hk(K, Lx, Ly)
    G = np.zeros((K, K, 2))
    for k1 in range(K):
        for k2 in range(K):
            a1 = k1 * np.pi / Lx
            a2 = k2 * np.pi / Ly
            G[k1, k2, 0] = -a1 * np.sin(a1 * x) * np.cos(a2 * y) / h[k1, k2]
            G[k1, k2, 1] = -a2 * np.cos(a1 * x) * np.sin(a2 * y) / h[k1, k2]
    return G


def lambda_k(K):
    """Sobolev weights (1 + ||k||^2)^(-3/2) for n=2."""
    lam = np.zeros((K, K))
    for k1 in range(K):
        for k2 in range(K):
            lam[k1, k2] = (1.0 + k1 * k1 + k2 * k2) ** (-1.5)
    return lam


def spatial_coefficients(phi_vals, points, K, origin, lengths):
    """phi_k = sum_s phi_s F_k(p_s), with phi normalized to sum 1."""
    phi = np.asarray(phi_vals, dtype=np.float64)
    phi = phi / phi.sum()
    out = np.zeros((K, K))
    for w, p in zip(phi, points):
        out += w * fourier_basis(p, K, origin, lengths)
    return out


def trajectory_coefficients(points, K, origin, lengths, weights=None):
    """c_k = weighted mean of F_k over trajectory points."""
    pts = np.asarray(points, dtype=np.float64)
    if weights is None:
        weights = np.ones(len(pts))
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    out = np.zeros((K, K))
    for wi, p in zip(w, pts):
        out += wi * fourier_basis(p, K, origin, lengths)
    return out


def ergodic_metric(ck, phik, K):
    return float(np.sum(lambda_k(K) * (ck - phik) ** 2))


def ergodic_gradient(points, ck, phik, K, origin, lengths, M):
    """dE/dp_m = (2/M) sum_k Lam_k (c_k - phi_k) grad F_k(p_m); (N, 2)."""
    lam = lambda_k(K)
    W = lam * (ck - phik)
    out = np.zeros((len(points), 2))
    for m, p in enumerate(points):
        G = grad_fourier_basis(p, K, origin, lengths)
        out[m, 0] = (2.0 / M) * np.sum(W * G[:, :, 0])
        out[m, 1] = (2.0 / M) * np.sum(W * G[:, :, 1])
    return out


# ----------------------------------------------------------------------------
# Target distributions (A.3): GMM and entropy map
# ----------------------------------------------------------------------------


def gaussian_pdf(p, mu, cov):
    d = np.asarray(p) - np.asarray(mu)
    cov = np.asarray(cov, dtype=np.float64)
    inv = np.linalg.inv(cov)
    det = np.linalg.det(cov)
    return np.exp(-0.5 * d @ inv @ d) / (2.0 * np.pi * np.sqrt(det))


def gmm_phi(points, mus, covs, weights):
    vals = np.zeros(len(points))
    for i, p in enumerate(points):
        for mu, cov, w in zip(mus, covs, weights):
            vals[i] += w * gaussian_pdf(p, mu, cov)
    return vals


def cell_entropy(p):
    """Bernoulli entropy H(p) = -p log p - (1-p) log(1-p), H(0)=H(1)=0."""
    p = np.clip(np.asarray(p, dtype=np.float64), 1e-12, 1.0 - 1e-12)
    return -(p * np.log(p) + (1.0 - p) * np.log(1.0 - p))


# ----------------------------------------------------------------------------
# Distance field (exact Euclidean distance transform) + barrier (A.5)
# ----------------------------------------------------------------------------


def exact_edt(occ, resolution):
    """Brute-force exact EDT: distance from each cell center to the nearest
    occupied cell center, in meters. INF-free: empty maps give a large value."""
    H, W = occ.shape
    ys, xs = np.nonzero(occ)
    out = np.full((H, W), 1e6)
    if len(ys) == 0:
        return out
    for i in range(H):
        for j in range(W):
            d2 = (ys - i) ** 2 + (xs - j) ** 2
            out[i, j] = np.sqrt(d2.min()) * resolution
    return out


def boundary_barrier_grad(p, origin, lengths, eps, weight):
    """Gradient of w * sum_i [relu(p_i - (hi_i - eps))^2 + relu((lo_i + eps) - p_i)^2]."""
    g = np.zeros(2)
    for i in range(2):
        lo = origin[i] + eps
        hi = origin[i] + lengths[i] - eps
        if p[i] > hi:
            g[i] += 2.0 * weight * (p[i] - hi)
        if p[i] < lo:
            g[i] += -2.0 * weight * (lo - p[i])
    return g


def obstacle_barrier_value(d, d_safe, weight, d_min):
    d = max(float(d), d_min)
    if d >= d_safe:
        return 0.0
    return weight * (1.0 / d - 1.0 / d_safe) ** 2


# ----------------------------------------------------------------------------
# Full controller tick (A.4 update law) — obstacle-free world
# ----------------------------------------------------------------------------


def ergodic_step(f, A_fn, B_fn, x0, U, dt, phik, K, origin, lengths, hist_points,
                 gamma, barrier_weight, b_weight, b_eps, r_diag, u_min, u_max):
    """One full ergodic-MPC update (boundary barrier only): returns
    (U_new, rhos, metric). Mirrors the jitted controller's contract:
    knots = X[0..H-1], c_k over [hist || knots], rho_H = 0 backward RK4 with
    frozen per-step coefficients, u = clip(-R^-1 B^T rho)."""
    H = len(U)
    X = rollout(f, x0, U, dt)
    knots = X[:-1]
    P = knots[:, :2]
    allpts = list(hist_points) + list(P)
    M = len(allpts)
    ck = trajectory_coefficients(allpts, K, origin, lengths)
    e = ergodic_gradient(P, ck, phik, K, origin, lengths, M)
    gs = np.zeros((H, 3))
    for t in range(H):
        bg = boundary_barrier_grad(P[t], origin, lengths, b_eps, b_weight)
        gs[t, :2] = gamma * e[t] + barrier_weight * bg
    As = np.stack([A_fn(knots[t], U[t]) for t in range(H)])
    rhos = costate_solve(As, gs, dt)
    U_new = np.zeros_like(np.asarray(U, dtype=np.float64))
    for t in range(H):
        B = B_fn(knots[t], U[t])
        U_new[t] = np.clip(-(B.T @ rhos[t]) / np.asarray(r_diag), u_min, u_max)
    metric = ergodic_metric(ck, phik, K)
    return U_new, rhos, metric

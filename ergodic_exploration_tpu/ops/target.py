"""Target spatial distributions phi(x): Gaussian mixtures and
mutual-information / entropy maps from an evolving occupancy grid.

Reference capability: ``Gaussian`` / ``Target`` (``target.hpp`` — GMM
evaluated on grid points, normalized over free space) and the
information-driven target recomputed from the occupancy grid each replan
(SURVEY.md sections 2 L3, 3 "Target distribution" / "Information-map target",
and BASELINE config 4).

TPU-first: everything is a dense vectorized evaluation over the (static
shape) sample lattice; the MI map is a fused elementwise entropy + separable
blur, recomputed per replan per scenario under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GaussianMixture(NamedTuple):
    """GMM target as a pytree: batchable over a leading scenario axis."""

    means: jnp.ndarray  # (J, 2)
    covs: jnp.ndarray  # (J, 2, 2)
    weights: jnp.ndarray  # (J,)

    @staticmethod
    def create(means, covs, weights=None) -> "GaussianMixture":
        means = jnp.asarray(means, dtype=jnp.float32)
        covs = jnp.asarray(covs, dtype=jnp.float32)
        if covs.ndim == 2:  # diagonal covariances given as (J, 2)
            covs = jax.vmap(jnp.diag)(covs)
        if weights is None:
            weights = jnp.ones(means.shape[0], dtype=jnp.float32)
        return GaussianMixture(means, covs, jnp.asarray(weights, dtype=jnp.float32))


def gmm_eval(points, gmm: GaussianMixture):
    """Unnormalized GMM density at points (N, 2) -> (N,).

    2x2 covariance inverses in closed form (no linalg solve on the hot path).
    """
    d = points[:, None, :] - gmm.means[None, :, :]  # (N, J, 2)
    a = gmm.covs[:, 0, 0]
    b = gmm.covs[:, 0, 1]
    c = gmm.covs[:, 1, 1]
    det = a * c - b * b
    inv_det = 1.0 / det
    # quadratic form d^T Sigma^-1 d with Sigma^-1 = [[c,-b],[-b,a]]/det
    q = (c * d[..., 0] ** 2 - 2.0 * b * d[..., 0] * d[..., 1] + a * d[..., 1] ** 2) * inv_det
    norm = gmm.weights / (2.0 * jnp.pi * jnp.sqrt(det))
    return jnp.sum(norm[None, :] * jnp.exp(-0.5 * q), axis=-1)


def normalize_phi(phi_vals, mask=None, eps: float = 1e-12):
    """Normalize sampled phi to a discrete distribution (sum = 1).

    ``mask`` zeroes excluded samples (e.g. occupied cells — the reference
    normalizes over free space). Degenerate all-zero inputs fall back to
    uniform over the mask.
    """
    phi = jnp.maximum(phi_vals, 0.0)
    if mask is not None:
        m = mask.astype(phi.dtype)
        phi = phi * m
        fallback = m / jnp.maximum(jnp.sum(m), 1.0)
    else:
        fallback = jnp.full_like(phi, 1.0 / phi.shape[0])
    s = jnp.sum(phi)
    return jnp.where(s > eps, phi / jnp.maximum(s, eps), fallback)


def entropy(p, eps: float = 1e-6):
    """Bernoulli cell entropy H(p) = -p log p - (1-p) log(1-p)."""
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))


def _box_blur_1d(img, radius: int, axis: int):
    """Separable box blur via cumulative sums; O(HW) independent of radius."""
    if radius <= 0:
        return img
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = (radius + 1, radius)
    c = jnp.cumsum(jnp.pad(img, pad, mode="edge"), axis=axis)
    hi = jax.lax.slice_in_dim(c, 2 * radius + 1, 2 * radius + 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
    return (hi - lo) / (2 * radius + 1)


def mutual_information_map(grid, sensor_radius_cells: int = 0):
    """Per-cell information value of the map: entropy of the occupancy
    probability, optionally blurred by a box sensor-footprint kernel so a
    pose is credited with the information visible around it; (H, W).

    This is the expected-entropy-reduction (mutual information) surrogate of
    SURVEY.md section 3 "Information-map target": unknown cells (p=0.5) carry
    maximal information, known free/occupied cells near zero. Occupied cells
    are zeroed after the blur so the target never asks the robot to stand in
    a wall.
    """
    h = entropy(grid.prob())
    h = _box_blur_1d(_box_blur_1d(h, sensor_radius_cells, -1), sensor_radius_cells, -2)
    return jnp.where(grid.occupied(), 0.0, h)


def sample_map_at(values, grid, points):
    """Nearest-cell gather of a per-cell map (H, W) at world points (N, 2)."""
    ij = grid.cell_index(points)  # (N, 2) as (ix, iy)
    return values[ij[:, 1], ij[:, 0]]


def mi_target_values(grid, points, sensor_radius_cells: int = 0):
    """phi values at sample points from the current occupancy grid,
    normalized to sum 1 — recomputed each replan as the grid evolves
    (BASELINE config 4)."""
    info = mutual_information_map(grid, sensor_radius_cells)
    vals = sample_map_at(info, grid, points)
    return normalize_phi(vals)


def gmm_target_values(points, gmm: GaussianMixture, free_mask=None):
    """phi values at sample points for a GMM target, normalized over the
    (optionally masked) free space."""
    return normalize_phi(gmm_eval(points, gmm), mask=free_mask)

"""Pallas TPU kernels for the hot ops XLA can't fully fuse.

Target refresh (the per-tick "10k grid samples" stage, SURVEY.md section
4.2 step 1): the XLA path materializes the (S, N) phi values in HBM between
the GMM evaluation, the normalizer reduction, and the (S, N) @ (N, K^2)
contraction. This kernel keeps everything VMEM-resident per scenario tile:
phi is evaluated on the VPU, the normalizer and the coefficient contraction
(MXU) accumulate in-register, and only the (S, K^2) result is written back
— one HBM pass over the inputs instead of three over (S, N).

Layout (per pallas guide): grid over scenario tiles of TS rows; the shared
sample lattice ``pts`` (N, 2) and dense basis table ``D`` (N, K^2) are
replicated into VMEM (4 MB at N=10k, K=10 — fits comfortably).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phik_gmm_kernel(means_ref, icov_ref, nrm_ref, pts_ref, d_ref, out_ref):
    """One scenario tile: evaluate phi over all N points, contract with D.

    means: (TS, J, 2), icov: (TS, J, 3) [Sinv_xx, Sinv_xy, Sinv_yy],
    nrm: (TS, J) w_j / (2 pi sqrt(det)), pts: (N, 2), d: (N, K2),
    out: (TS, K2).
    """
    TS, J, _ = means_ref.shape
    px = pts_ref[:, 0]  # (N,)
    py = pts_ref[:, 1]

    phi = jnp.zeros((TS, px.shape[0]), dtype=jnp.float32)
    for j in range(J):  # J is tiny (number of mixture components)
        dx = px[None, :] - means_ref[:, j, 0:1]  # (TS, N)
        dy = py[None, :] - means_ref[:, j, 1:2]
        q = (
            icov_ref[:, j, 0:1] * dx * dx
            + 2.0 * icov_ref[:, j, 1:2] * dx * dy
            + icov_ref[:, j, 2:3] * dy * dy
        )
        phi = phi + nrm_ref[:, j:j + 1] * jnp.exp(-0.5 * q)

    total = jnp.sum(phi, axis=1, keepdims=True)  # (TS, 1)
    ck = jnp.dot(phi, d_ref[:, :], preferred_element_type=jnp.float32)  # (TS, K2)
    out_ref[:, :] = ck / jnp.maximum(total, 1e-12)


def phik_from_gmm_pallas(means, covs, weights, pts, D, tile: int = 8,
                         interpret=None):
    """Fused batched GMM target coefficients: (S, K^2), normalized.

    Args:
        means: (S, J, 2); covs: (S, J, 2, 2); weights: (S, J).
        pts: (N, 2) shared sample lattice; D: (N, K^2) dense basis table.
        tile: scenarios per program (S must be divisible by it).
    """
    S, J, _ = means.shape
    N, K2 = D.shape
    if S % tile != 0:
        raise ValueError(f"S={S} not divisible by tile={tile}")

    a = covs[..., 0, 0]
    b = covs[..., 0, 1]
    c = covs[..., 1, 1]
    det = a * c - b * b
    inv_det = 1.0 / det
    icov = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)  # (S, J, 3)
    nrm = weights / (2.0 * jnp.pi * jnp.sqrt(det))  # (S, J)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (S // tile,)
    return pl.pallas_call(
        _phik_gmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, J, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, J, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, J), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, K2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, K2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * N * (K2 + 8 * J),
            bytes_accessed=N * (K2 + 2) * 4 + S * K2 * 4,
            transcendentals=S * N * J,
        ),
        interpret=interpret,
    )(means, icov, nrm, pts, D)

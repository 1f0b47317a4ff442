"""Pallas TPU kernels for the hot ops XLA can't fully fuse.

Target refresh (the per-tick "10k grid samples" stage, SURVEY.md section
4.2 step 1): the XLA path materializes the (S, N) phi values in HBM between
the GMM evaluation, the normalizer reduction, and the (S, N) @ (N, K^2)
contraction. This kernel keeps everything VMEM-resident per scenario tile:
phi is evaluated on the VPU chunk by chunk, the normalizer and the
coefficient contraction (MXU) accumulate across chunks, and only the
(S, K^2) result is written back — one HBM pass over the inputs instead of
three over (S, N).

Layout (per pallas guide): grid over scenario tiles of TS rows; the shared
sample lattice ``pts`` (N, 2) and dense basis table ``D`` (N, K^2) sit in
VMEM (4 MB at N=10k, K=10); the sample axis is walked in NC-point chunks
inside a fori_loop so the (TS, N) intermediates never exist (a whole-N
version ran the Mosaic scoped-vmem stack past its 16 MB limit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024  # sample points per inner step; (TS, _CHUNK) temps ~32 KB


def _phik_gmm_kernel(means_ref, icov_ref, nrm_ref, pts_ref, d_ref, out_ref):
    """One scenario tile: accumulate phi @ D and sum(phi) over N chunks.

    means: (TS, J, 2), icov: (TS, J, 3) [Sinv_xx, Sinv_xy, Sinv_yy],
    nrm: (TS, J) w_j / (2 pi sqrt(det)), pts: (N, 2), d: (N, K2),
    out: (TS, K2). N is padded to a _CHUNK multiple (pad points are placed
    far outside the domain so their density underflows to zero).
    """
    TS, J, _ = means_ref.shape
    N, K2 = d_ref.shape
    n_chunks = N // _CHUNK

    def body(i, carry):
        ck, tot = carry
        sl = pl.ds(i * _CHUNK, _CHUNK)
        px = pts_ref[sl, 0]  # (NC,)
        py = pts_ref[sl, 1]
        phi = jnp.zeros((TS, _CHUNK), dtype=jnp.float32)
        for j in range(J):  # J is tiny (mixture components)
            dx = px[None, :] - means_ref[:, j, 0:1]  # (TS, NC)
            dy = py[None, :] - means_ref[:, j, 1:2]
            q = (
                icov_ref[:, j, 0:1] * dx * dx
                + 2.0 * icov_ref[:, j, 1:2] * dx * dy
                + icov_ref[:, j, 2:3] * dy * dy
            )
            phi = phi + nrm_ref[:, j:j + 1] * jnp.exp(-0.5 * q)
        tot = tot + jnp.sum(phi, axis=1, keepdims=True)
        # HIGHEST precision: the MXU rounds matmul inputs to bf16 by default,
        # which measured ~9e-4 relative error on real hardware — most of the
        # 1e-3 parity budget. Mosaic implements only DEFAULT and HIGHEST
        # (HIGH raises NotImplementedError), so take the 6-pass variant; the
        # contraction is a small (TS, chunk)@(chunk, K^2) next to the VPU exp.
        ck = ck + jnp.dot(
            phi, d_ref[sl, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return ck, tot

    ck0 = jnp.zeros((TS, K2), dtype=jnp.float32)
    tot0 = jnp.zeros((TS, 1), dtype=jnp.float32)
    ck, tot = jax.lax.fori_loop(0, n_chunks, body, (ck0, tot0))
    out_ref[:, :] = ck / jnp.maximum(tot, 1e-12)


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

    # pad the sample axis to a chunk multiple; pad points sit ~1e6 m away so
    # every mixture's density underflows to exactly 0 there
    pad = (-N) % _CHUNK
    if pad:
        pts = jnp.concatenate([pts, jnp.full((pad, 2), 1.0e6, pts.dtype)])
        D = jnp.concatenate([D, jnp.zeros((pad, K2), D.dtype)])
        N += pad

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

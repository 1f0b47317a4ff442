"""Pallas TPU kernels for the hot ops XLA can't fully fuse.

Target refresh (the per-tick "10k grid samples" stage, SURVEY.md section
4.2 step 1): the XLA path materializes (S, N)-sized phi intermediates in HBM
between the GMM evaluation, the normalizer reduction, and the
(S, N) @ (N, K^2) contraction. This kernel keeps everything VMEM-resident
per (scenario-tile, sample-chunk) block: phi is evaluated on the VPU, the
normalizer and the coefficient contraction (MXU) accumulate in scratch
across chunks, and only the (S, K^2) result is written back — one HBM pass
over the inputs instead of several over (S, N).
Measured on v5e at S=4096, N=10k, K^2=100: 2.0 ms vs 3.7 ms for the XLA
path, identical results to 2.2e-6 (tools/tpu_probe.py).

Layout rules this kernel learned the hard way (probe history):
- 2-D grid (scenario tiles x sample chunks), sample chunks innermost and
  marked "arbitrary" (sequential reduction); blocks of ``pts``/``D`` stream
  through VMEM double-buffered. A whole-N-resident version exceeded the
  16 MB scoped-VMEM limit at S = 4096.
- Per-scenario GMM parameters are passed TRANSPOSED, (J, S), so the batch
  axis lands on TPU lanes. 3-D blocks shaped (tile, J, 2/3) made Mosaic
  blow scoped VMEM ~linearly in tile (102 MB at tile=64) and compile for
  minutes; the (J, S) layout compiles in ~1 s at any tile.
- The in-kernel dot runs HIGHEST precision: the MXU's default bf16 input
  rounding measured ~9e-4 relative error — most of the 1e-3 parity budget.
  Mosaic implements only DEFAULT/HIGHEST (HIGH raises NotImplementedError).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024  # sample points per grid step


def _phik_gmm_body(mx_r, my_r, ia_r, ib_r, ic_r, nr_r, pts_r, d_r,
                   out_r, tot_out_r, acc_r, tot_r,
                   mask_r=None, accm_r=None, totm_r=None):
    """One (scenario-tile, sample-chunk) block.

    mx/my: (J, TS) component means; ia/ib/ic: (J, TS) inverse-covariance
    entries [Sinv_xx, Sinv_xy, Sinv_yy]; nr: (J, TS) w_j / (2 pi sqrt(det));
    pts: (2, CHUNK); d: (CHUNK, K2); out: (TS, K2); tot_out: (TS, 1) the
    final phi normalizer (lets the caller apply the unmasked degenerate
    fallback); acc/tot are VMEM scratch persisting across the (innermost)
    chunk axis. The sample axis is padded to a _CHUNK multiple with far-away
    points whose density underflows to 0.
    mask_r (optional): (TS, CHUNK) free-space weights multiplied into phi
    BEFORE the normalizer accumulates — reference semantics "GMM phi
    normalized over free space" (SURVEY.md section 3 target row / A.3).
    The masked variant also accumulates the MASK's own contraction
    (accm/totm) so a scenario whose masked phi underflows to ~0 falls back
    to uniform-over-mask IN-KERNEL — exact normalize_phi parity (VERDICT r2
    weak 6; costs a second dot, on the per-scenario-mask path only).
    """
    J, TS = mx_r.shape
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_r[:, :] = jnp.zeros_like(acc_r)
        tot_r[:, :] = jnp.zeros_like(tot_r)
        if mask_r is not None:
            accm_r[:, :] = jnp.zeros_like(accm_r)
            totm_r[:, :] = jnp.zeros_like(totm_r)

    px = pts_r[0, :]  # (CHUNK,)
    py = pts_r[1, :]
    phi = jnp.zeros((TS, px.shape[0]), jnp.float32)
    for c in range(J):  # J is tiny (mixture components)
        dx = px[None, :] - mx_r[c, :][:, None]  # (TS, CHUNK)
        dy = py[None, :] - my_r[c, :][:, None]
        q = (ia_r[c, :][:, None] * dx * dx
             + 2.0 * ib_r[c, :][:, None] * dx * dy
             + ic_r[c, :][:, None] * dy * dy)
        phi = phi + nr_r[c, :][:, None] * jnp.exp(-0.5 * q)
    if mask_r is not None:
        phi = phi * mask_r[:, :]
        totm_r[:, :] += jnp.sum(mask_r[:, :], axis=1, keepdims=True)
        accm_r[:, :] += jnp.dot(
            mask_r[:, :], d_r[:, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    tot_r[:, :] += jnp.sum(phi, axis=1, keepdims=True)
    acc_r[:, :] += jnp.dot(
        phi, d_r[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == n_chunks - 1)
    def _():
        tot_out_r[:, :] = tot_r[:, :]
        ck = acc_r[:, :] / jnp.maximum(tot_r[:, :], 1e-12)
        if mask_r is not None:
            # normalize_phi parity: s <= eps -> uniform over the mask
            # (empty mask -> 0/max(0,1) = 0, also matching)
            fb = accm_r[:, :] / jnp.maximum(totm_r[:, :], 1.0)
            ck = jnp.where(tot_r[:, :] > 1e-12, ck, fb)
        out_r[:, :] = ck


def _phik_gmm_kernel(mx_r, my_r, ia_r, ib_r, ic_r, nr_r, pts_r, d_r,
                     out_r, tot_out_r, acc_r, tot_r):
    _phik_gmm_body(mx_r, my_r, ia_r, ib_r, ic_r, nr_r, pts_r, d_r,
                   out_r, tot_out_r, acc_r, tot_r)


def _phik_gmm_masked_kernel(mx_r, my_r, ia_r, ib_r, ic_r, nr_r, pts_r, d_r,
                            mask_r, out_r, tot_out_r, acc_r, tot_r,
                            accm_r, totm_r):
    _phik_gmm_body(mx_r, my_r, ia_r, ib_r, ic_r, nr_r, pts_r, d_r,
                   out_r, tot_out_r, acc_r, tot_r,
                   mask_r=mask_r, accm_r=accm_r, totm_r=totm_r)


def phik_from_gmm_pallas(means, covs, weights, pts, D, tile: int | None = None,
                         interpret=None, free_mask=None):
    """Fused batched GMM target coefficients: (S, K^2), normalized.

    Args:
        means: (S, J, 2); covs: (S, J, 2, 2); weights: (S, J).
        pts: (N, 2) shared sample lattice; D: (N, K^2) dense basis table.
        tile: scenarios per program (must divide S; default: largest of
            128/64/32/16/8 that divides S — measured flat 2.0-2.2 ms across
            128..512 at S=4096, and small tiles only hurt).
        free_mask: optional (S, N) free-space weights (1 = free, 0 =
            occupied); phi is masked BEFORE normalization (reference:
            "normalized over free space", SURVEY.md A.3).
    """
    S, J, _ = means.shape
    N, K2 = D.shape
    if tile is None:
        tile = next((t for t in (128, 64, 32, 16, 8) if S % t == 0), None)
        if tile is None:
            raise ValueError(f"S={S} not divisible by any supported tile")
    if S % tile != 0:
        raise ValueError(f"S={S} not divisible by tile={tile}")

    pad = (-N) % _CHUNK
    if pad:
        pts = jnp.concatenate([pts, jnp.full((pad, 2), 1.0e6, pts.dtype)])
        D = jnp.concatenate([D, jnp.zeros((pad, K2), D.dtype)])
        if free_mask is not None:
            free_mask = jnp.concatenate(
                [free_mask, jnp.zeros((S, pad), free_mask.dtype)], axis=1)
        N += pad
    n_chunks = N // _CHUNK

    a = covs[..., 0, 0]
    b = covs[..., 0, 1]
    c = covs[..., 1, 1]
    det = a * c - b * b
    # transposed (J, S) parameter layout: batch axis on lanes (see module doc)
    mx = means[..., 0].T
    my = means[..., 1].T
    ia = (c / det).T
    ib = (-b / det).T
    ic = (a / det).T
    nr = (weights / (2.0 * jnp.pi * jnp.sqrt(det))).T
    ptsT = pts.T  # (2, N)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (S // tile, n_chunks)
    param_spec = pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    in_specs = [param_spec] * 6 + [
        pl.BlockSpec((2, _CHUNK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((_CHUNK, K2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [mx, my, ia, ib, ic, nr, ptsT, D]
    kernel = _phik_gmm_kernel
    mask_bytes = 0
    dot_passes = 1
    scratch = [
        pltpu.VMEM((tile, K2), jnp.float32),
        pltpu.VMEM((tile, 1), jnp.float32),
    ]
    if free_mask is not None:
        kernel = _phik_gmm_masked_kernel
        in_specs.append(
            pl.BlockSpec((tile, _CHUNK), lambda i, j: (i, j), memory_space=pltpu.VMEM))
        operands.append(free_mask.astype(jnp.float32))
        mask_bytes = S * N * 4
        dot_passes = 2  # the mask's own contraction (degenerate fallback)
        scratch += [
            pltpu.VMEM((tile, K2), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
        ]
    ck, tot = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, K2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, K2), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * N * (dot_passes * K2 + 8 * J),
            bytes_accessed=(S // tile) * N * (K2 + 2) * 4 + S * K2 * 4 + mask_bytes,
            transcendentals=S * N * J,
        ),
        interpret=interpret,
    )(*operands)
    if free_mask is None:
        # normalize_phi parity for the unmasked path: a scenario whose phi
        # underflows everywhere falls back to uniform over the lattice
        # (ck_u = colsum(D) / N — constant, so the select is free; in-kernel
        # it would be a captured array constant, which Mosaic forbids)
        n_real = N - pad
        ck_u = (jnp.sum(D, axis=0) / float(n_real))[None, :]
        ck = jnp.where(tot > 1e-12, ck, ck_u)
    return ck

"""VMEM-resident Pallas kernel for the config-4 MI target refresh.

The XLA dense path (engine._phik_grid_batch_dense_fn) is HBM-bound: the
(S, H, W) entropy map, two (S, h, nsx) resample intermediates, and the
(S, nsx, nsy) lattice values all round-trip through HBM (~1.6 GB at
S = 4096) even though each scenario's whole pipeline fits VMEM. This kernel
runs entropy -> blur-folded resample -> free-mask -> separable cosine
contraction in ONE pass: the belief map is read from HBM once and only the
(K, S*Kp) raw coefficients come back (VERDICT r3 next-round 2; SURVEY.md
section 3 "Information-map target" per-tick semantics).

Layout (the whole trick):
- The belief ships LANE-MAJOR, ``beliefT`` (h, S*wp): scenario chunks are
  lane slices, so per-program blocks are (h, sc*wp) with no 3-D blocks and
  no in-kernel transposes. wp = W padded to a 128 multiple; pad cells are
  blocked from the result by the ZERO columns of the sampling matrices, so
  the pad value is irrelevant.
- Both in-kernel reshapes keep the lane dimension a 128 multiple on both
  sides ((nsy, sc*wp) -> (nsy*sc, wp) and (nsy*sc, Kp) -> (nsy, sc*Kp) with
  wp, Kp % 128 == 0) — pure vreg re-indexing, the only reshape class Mosaic
  handles without a relayout round trip.
- All resampling matrices are exact in bf16 (0/1 one-hots; blur counts
  <= r+2), so their dots run in one or two DEFAULT-precision MXU passes:
  entropy/vals operands are split hi+lo (fp32 ~ bf16(hi)+bf16(lo) to
  ~2^-17 relative), recovering ~fp32 accuracy at a third of HIGHEST's
  6-pass cost (the solve kernel's shared-map chunk trick).

Parity vs the XLA dense path is pinned by tests/test_mi_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF = jax.lax.Precision.DEFAULT


def _split_dot(a, b):
    """dot(a, b) with fp32-like accuracy from DEFAULT-precision passes:
    a is split hi+lo; b must be EXACT in bf16 (one-hots / blur counts)."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    lo = a - hi
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=_DEF)
    return d(hi, b) + d(lo, b)


def _split_dot2(a, b):
    """dot(a, b) with BOTH operands split hi+lo (neither bf16-exact)."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=_DEF)
    return d(ah, bh) + d(ah, bl) + d(al, bh) + d(al, bl)


def _make_kernel(sc: int, wp: int, Kp: int, nsx: int, nsy: int,
                 occupied_threshold: float, eps: float):
    def kernel(bt_r, ayb_r, axbt_r, ay_r, axt_r, cxh_r, cyht_r, out_r):
        b = bt_r[:, :]  # (h, sc*wp)
        # entropy of the occupancy probability (grid.prob + target.entropy)
        p = jnp.clip(jnp.where(b < 0.0, 0.5, b), eps, 1.0 - eps)
        e = -(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))
        # free mask (~grid.occupied): unknown cells are NOT obstacles
        z = (b < occupied_threshold).astype(jnp.float32)

        # h-axis: blurred resample of entropy, plain resample of the mask.
        # (nsy, h) @ (h, sc*wp): counts exact in bf16 -> split only e
        ayb = ayb_r[:, :]
        hi = e.astype(jnp.bfloat16).astype(jnp.float32)
        lo = e - hi
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                              precision=_DEF)
        e1 = d(ayb, hi) + d(ayb, lo)  # (nsy, sc*wp)
        z1 = d(ay_r[:, :], z)  # exact: 0/1 @ 0/1

        # w-axis: lane-aligned reshape (nsy, sc*wp) -> (nsy*sc, wp)
        e2 = e1.reshape(nsy * sc, wp)
        z2 = z1.reshape(nsy * sc, wp)
        ez = _split_dot(e2, axbt_r[:, :])  # (nsy*sc, nsx)
        zz = d(z2, axt_r[:, :])  # exact
        vals = jnp.maximum(ez * zz, 0.0)  # (nsy*sc, nsx)

        # separable cosine contraction (hk folded into cxh/cyht)
        w1 = _split_dot2(vals, cxh_r[:, :])  # (nsy*sc, Kp)
        w2 = w1.reshape(nsy, sc * Kp)
        out_r[:, :] = _split_dot2(cyht_r[:, :], w2)  # (K, sc*Kp)

    return kernel


def _pick_sc(S: int, w: int) -> int:
    for sc in (64, 32, 16, 8):
        if S % sc == 0:
            return sc
    return 1


def phik_from_grid_pallas(beliefT, g0, domain, K: int, grid_samples,
                          sensor_radius_cells: int = 0,
                          occupied_threshold: float = 0.65,
                          eps: float = 1e-6, sc: int | None = None,
                          interpret=None):
    """Batched MI target coefficients from a LANE-MAJOR belief batch.

    Args:
        beliefT: (h, S*wp) transposed belief maps — ``pack_beliefs`` builds
            this from a standard (S, h, w) batch (wp = w padded to 128).
        g0: scenario-0 GridMap (geometry only — shared-geometry contract,
            same as the dense path).
        domain: shared (unbatched) exploration domain.
    Returns (S, K, K) phi_k, normalized with the dense path's exact
    degenerate fallback (uniform over the lattice).
    """
    from ergodic_exploration_tpu.ops import basis, target as target_ops

    h, w = g0.shape
    nsx, nsy = grid_samples
    wp = -(-w // 128) * 128
    Swp = beliefT.shape[1]
    if Swp % wp:
        raise ValueError(f"beliefT lane dim {Swp} not a multiple of wp={wp}")
    S = Swp // wp
    if sc is None:
        sc = _pick_sc(S, w)
    if S % sc:
        raise ValueError(f"S={S} not divisible by sc={sc}")
    Kp = 128  # padded K: same MXU cost as any width <= 128
    if K > Kp:
        raise ValueError(f"K={K} > {Kp} unsupported by the MI kernel")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # --- trace-time matrices (shared geometry; all bf16-exact except cos) ---
    Ax, Ay = target_ops.sampling_one_hots(g0, grid_samples, domain)  # (ns, w/h)
    r = sensor_radius_cells
    Bx = target_ops.blur_count_matrix(w, r)
    By = target_ops.blur_count_matrix(h, r)
    Axb = jnp.matmul(Ax, Bx, precision=_DEF)  # (nsx, w) small-int exact
    Ayb = jnp.matmul(Ay, By, precision=_DEF)  # (nsy, h)
    padx = jnp.zeros((nsx, wp - w), jnp.float32)
    AxbT = jnp.concatenate([Axb, padx], axis=1).T  # (wp, nsx) zero pad rows
    AxT = jnp.concatenate([Ax, padx], axis=1).T

    # per-axis cosine tables with the hk normalization folded in:
    # cxh[ix, k1] * cyh[iy, k2] = F_(k1,k2)(p) = cosx cosy / hk
    cosx, cosy = basis.axis_cos_tables(K, grid_samples, domain)
    ck = jnp.where(jnp.arange(K) == 0, 1.0, 0.5).astype(jnp.float32)
    sx = 1.0 / jnp.sqrt(domain.lengths[0] * ck)  # (K,)
    sy = 1.0 / jnp.sqrt(domain.lengths[1] * ck)
    cxh = jnp.zeros((nsx, Kp), jnp.float32).at[:, :K].set(cosx * sx[None, :])
    cyhT = (cosy * sy[None, :]).T  # (K, nsy)

    out = pl.pallas_call(
        _make_kernel(sc, wp, Kp, nsx, nsy, occupied_threshold, eps),
        grid=(S // sc,),
        in_specs=[
            pl.BlockSpec((h, sc * wp), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nsy, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, nsx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nsy, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, nsx), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nsx, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nsy), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, sc * Kp), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, S * Kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(beliefT, Ayb, AxbT, Ay, AxT, cxh, cyhT)

    # out[k2, (s, k1)] -> raw (S, K, K); then the dense path's exact
    # normalization + degenerate fallback (engine._phik_grid_batch_dense_fn)
    raw = jnp.transpose(out.reshape(K, S, Kp)[:, :, :K], (1, 2, 0))  # (S, K1, K2)
    hk = basis.hk_norm(K, domain.lengths)
    total = raw[:, 0, 0] * hk[0, 0]
    n = float(nsx * nsy)
    fallback = ((jnp.sum(cosx, axis=0)[:, None] * jnp.sum(cosy, axis=0)[None, :])
                / (n * hk))[None]
    return jnp.where(
        (total > 1e-12)[:, None, None],
        raw / jnp.maximum(total, 1e-12)[:, None, None],
        fallback,
    )


def pack_beliefs(data):
    """(S, h, w) belief batch -> the kernel's LANE-MAJOR (h, S*wp) layout
    (wp = w padded to a 128 multiple; pad value irrelevant — zero sampling
    columns block it). One transpose pass; amortize it over refreshes by
    keeping beliefs packed where possible."""
    S, h, w = data.shape
    wp = -(-w // 128) * 128
    if wp != w:
        data = jnp.concatenate(
            [data, jnp.ones((S, h, wp - w), data.dtype)], axis=2)
    return jnp.transpose(data, (1, 0, 2)).reshape(h, S * wp)

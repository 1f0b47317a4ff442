"""VMEM-resident Pallas kernel for the config-4 MI target refresh.

The XLA dense path (engine._phik_grid_batch_dense_fn) is HBM-bound: the
(S, H, W) entropy map, two (S, h, nsx) resample intermediates, and the
(S, nsx, nsy) lattice values all round-trip through HBM (~2.5 GB at
S = 4096, ~3 ms at v5e bandwidth) even though each scenario's pipeline fits
VMEM. This kernel runs entropy -> separable box blur -> free-mask ->
cosine contraction in ONE pass: the belief batch is read from HBM once in
its NATIVE (S*h, w) row layout and only the (K, S*Kp) raw coefficients come
back (VERDICT r3 next-round 2; SURVEY.md section 3 "Information-map target"
per-tick semantics).

Design (v4 — each choice measured on v5e: v1's lane-major layout needed a
host-side (S, h, w) -> (h, S*wp) pack that alone cost 3.4 ms, more than the
kernel; v2's minor-dim-100 block loads ran ~8x off the DMA floor; v3's
extra in-kernel relayouts for a shared y-blur dot cost more than they
saved):

- NEAR-NATIVE LAYOUT: the beliefs are lane-padded once in XLA (contiguous
  last-dim pad) and reshape FREE to (S*h, wp) rows (s, iy); blocks are
  (sc*h, wp) scenario chunks at full DMA rate. No transposes touch HBM.
- RESAMPLE FOLDED INTO THE COSINES: nearest-cell sampling is one-hot
  selection, so it commutes with the elementwise mask product and folds
  into the contraction tables at trace time: cxA = Ax^T Cx (wp, Kp) and
  cyA = Cy^T Ay (K, h). The two lattice-resample GEMM pairs of the dense
  path vanish; the kernel works entirely in CELL space and stays exact for
  ANY lattice (duplicate/subset cell selections sum correctly).
- EDGE-CLAMPED BOX BLUR (ops/target.blur_count_matrix semantics) with NO
  relayout: x as one MXU dot against the zero-padded banded count matrix
  BxT (exact small integers -> exact in bf16; blur_mode="rolls" swaps in
  VPU clamp-shifts instead), y as 2r iterated clamp-shifts on sublanes —
  where(i >= 1, roll(x, 1), x) composes to x[clip(i-k, 0)] exactly, and
  the iy = row % h mask keeps shifts inside each scenario chunk.
- ONE in-kernel relayout total: (sc, h, Kp) -> (h, sc*Kp) on the small
  post-x-contraction intermediate, feeding the final narrow (K, h) dot.
- Split-precision dots: f32 ~ bf16(hi) + bf16(lo); 2 DEFAULT passes when
  one side is integer-exact (the blur), 3 passes (lo@lo ~ 2^-34 dropped)
  for the cosine contractions — ~1e-6 relative accuracy overall.

Parity vs the XLA dense path is pinned by tests/test_mi_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF = jax.lax.Precision.DEFAULT


def _split_dot3(a, b):
    """dot(a, b) ~ fp32 from 3 DEFAULT-precision passes (lo@lo dropped)."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=_DEF)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _split_dot2p(a, b):
    """dot(a, b) ~ fp32 from 2 DEFAULT passes; b must be EXACT in bf16
    (the banded blur count matrices: small integers)."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=_DEF)
    return d(ah, b) + d(al, b)


def _make_kernel(sc: int, h: int, w: int, wp: int, K: int, Kp: int, r: int,
                 occupied_threshold: float, eps: float,
                 blur_mode: str = "xdot", fc: int = 0,
                 _ablate: frozenset = frozenset()):
    """``_ablate`` (perf diagnostics only, NOT parity-exact): a set of stage
    names to stub out, used by tools/tpu_mi_ablate.py to price each kernel
    stage — {"lin_entropy", "no_yblur", "no_xblur", "no_fc", "dot1",
    "no_tail", "no_contract"}."""
    def kernel(b_r, bxt_r, cxa_r, cya_r, *rest):
        if fc > 0:
            fxt_r, out_r = rest
        else:
            (out_r,) = rest
        b = b_r[:, :]  # (sc*h, wp) rows are (s, iy); lanes >= w are pad
        # entropy of the occupancy probability (grid.prob + target.entropy).
        # Pad lanes carry junk entropy but every downstream contraction
        # (BxT pad rows, cxA pad rows) has ZERO weights there.
        p = jnp.clip(jnp.where(b < 0.0, 0.5, b), eps, 1.0 - eps)
        if "lin_entropy" in _ablate:
            e = 2.7725887 * p * (1.0 - p)  # matches H at p=0.5; no logs
        else:
            e = -(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))
        # free mask (~grid.occupied): unknown cells are NOT obstacles
        z = (b < occupied_threshold).astype(jnp.float32)

        # ---- x blur (edge-clamped box, blur_count_matrix semantics) ----
        if "no_xblur" in _ablate:
            t1 = e
        elif blur_mode == "xdot":
            # one MXU dot against the banded count matrix: zero pad
            # rows/cols keep the lane pad inert, clamp semantics live in BxT
            t1 = _split_dot2p(e, bxt_r[:, :])  # (sc*h, wp)
        else:  # "rolls": iterated clamp-shifts on lanes (VPU)
            ix = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
            t1 = e
            dn, up = e, e
            for _ in range(r):
                dn = jnp.where(ix >= 1, jnp.roll(dn, 1, axis=1), dn)
                up = jnp.where(ix < w - 1, jnp.roll(up, -1, axis=1), up)
                t1 = t1 + dn + up
        # ---- y blur: iterated clamp-shifts on sublanes (VPU). The row
        # mask uses iy = row % h so shifts never cross a scenario chunk;
        # clampshift^k(x)[i] = x[clip(i-k, 0)] exactly. No relayouts. ----
        iy = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, b.shape, 0),
                         jnp.int32(h))
        t2 = t1
        if "no_yblur" not in _ablate:
            dn, up = t1, t1
            for _ in range(r):
                dn = jnp.where(iy >= 1, jnp.roll(dn, 1, axis=0), dn)
                up = jnp.where(iy < h - 1, jnp.roll(up, -1, axis=0), up)
                t2 = t2 + dn + up
        if fc > 0 and "no_fc" not in _ablate:
            # frontier mask (target.frontier_adjacency): dilate the KNOWN-
            # FREE mask by the edge-clamped box count — x as ONE default-
            # precision dot against the banded 0/1->int count matrix (kf is
            # 0/1, counts are small ints: bf16-exact), y as fc clamp-shift
            # passes (same machinery as the blur above), then threshold.
            kf = ((b >= 0.0) & (b < occupied_threshold)).astype(jnp.float32)
            c1 = jnp.dot(kf, fxt_r[:, :], precision=_DEF,
                         preferred_element_type=jnp.float32)  # (sc*h, wp)
            cnt = c1
            dnf, upf = c1, c1
            for _ in range(fc):
                dnf = jnp.where(iy >= 1, jnp.roll(dnf, 1, axis=0), dnf)
                upf = jnp.where(iy < h - 1, jnp.roll(upf, -1, axis=0), upf)
                cnt = cnt + dnf + upf
            t2 = t2 * (cnt > 0.5).astype(jnp.float32)
        vals = jnp.maximum(t2 * z, 0.0)  # (sc*h, wp) cell-space MI field

        if "no_contract" in _ablate:
            out_r[:, :] = jnp.zeros((K, sc * Kp), jnp.float32) + jnp.sum(vals)
            return
        # x contraction with the resample-folded cosine table (no relayout)
        if "dot1" in _ablate:
            w1 = jnp.dot(vals, cxa_r[:, :], precision=_DEF,
                         preferred_element_type=jnp.float32)
        else:
            w1 = _split_dot3(vals, cxa_r[:, :])  # (sc*h, Kp)
        if "no_tail" in _ablate:
            out_r[:, :] = jnp.zeros((K, sc * Kp), jnp.float32) + jnp.sum(w1)
            return
        # the ONE relayout: (sc, h, Kp) -> (h, sc*Kp), then the narrow y dot
        w2 = jnp.transpose(w1.reshape(sc, h, Kp), (1, 0, 2)).reshape(
            h, sc * Kp)
        if "dot1" in _ablate:
            out_r[:, :] = jnp.dot(cya_r[:, :], w2, precision=_DEF,
                                  preferred_element_type=jnp.float32)
        else:
            out_r[:, :] = _split_dot3(cya_r[:, :], w2)  # (K, sc*Kp)

    return kernel


def _pick_sc(S: int, h: int = 100, wp: int = 128, fc: int = 0) -> int:
    # Largest scenario chunk whose kernel fits the 16 MB scoped-VMEM stack:
    # the block plus ~8 live (sc*h, wp) f32 intermediates (ADVICE r4: sized
    # by the ACTUAL grid shape, not the h=w=100 default — a 200x200 grid at
    # sc=32 previously surfaced only as a Mosaic compile failure). The
    # frontier stage (fc > 0) keeps ~4 more live (kf, c1, cnt, roll
    # temporaries) — round-5 review finding.
    budget = 15 * 2**20
    live = 13 if fc > 0 else 9
    for sc in (32, 16, 8, 4, 2):
        if S % sc == 0 and live * sc * h * wp * 4 <= budget:
            return sc
    return 1


def mi_operands(g0, domain, K: int, grid_samples, sensor_radius_cells: int,
                Kp: int, wp: int):
    """Trace-time operands (shared geometry): the zero-padded banded blur
    count matrix BxT (wp, wp), the resample-folded cosine tables
    cxA = Ax^T Cx (wp, Kp) and cyA = Cy^T Ay (K, h), plus the raw lattice
    cosine tables for the degenerate-target fallback. Zero pad
    rows/columns keep the lane pad inert through every contraction."""
    from ergodic_exploration_tpu.ops import basis, target as target_ops

    h, w = g0.shape
    r = sensor_radius_cells
    Ax, Ay = target_ops.sampling_one_hots(g0, grid_samples, domain)  # (ns, w/h)
    BxT = jnp.zeros((wp, wp), jnp.float32).at[:w, :w].set(
        target_ops.blur_count_matrix(w, r).T)
    cosx, cosy = basis.axis_cos_tables(K, grid_samples, domain)
    ck = jnp.where(jnp.arange(K) == 0, 1.0, 0.5).astype(jnp.float32)
    sx = 1.0 / jnp.sqrt(domain.lengths[0] * ck)  # (K,)
    sy = 1.0 / jnp.sqrt(domain.lengths[1] * ck)
    cxA = jnp.zeros((wp, Kp), jnp.float32).at[:w, :K].set(
        jnp.matmul(Ax.T, cosx * sx[None, :], precision=jax.lax.Precision.HIGHEST))
    cyA = jnp.matmul((cosy * sy[None, :]).T, Ay,
                     precision=jax.lax.Precision.HIGHEST)  # (K, h)
    return BxT, cxA, cyA, cosx, cosy


def phik_from_grid_pallas(data, g0, domain, K: int, grid_samples,
                          sensor_radius_cells: int = 0,
                          occupied_threshold: float = 0.65,
                          eps: float = 1e-6, sc: int | None = None,
                          interpret=None, blur_mode: str = "xdot",
                          frontier_cells: int = 0,
                          _ablate: frozenset = frozenset()):
    """Batched MI target coefficients straight from the (S, h, w) beliefs.

    Args:
        data: (S, h, w) belief batch (native layout; no packing needed), OR
            the same batch already lane-padded to (S, h, wp) with ARBITRARY
            margin values — the TRUE width comes from ``g0``, every
            contraction/blur matrix is built at that width (zero rows/cols
            beyond it), so margin cells contribute exactly nothing and the
            result is bit-identical to the unpadded call. Carrying the
            padded layout across ticks skips the per-call XLA pad
            (~0.5 ms at S=4096 on v5e — round-5 measurement).
        g0: scenario-0 GridMap (geometry only — shared-geometry contract,
            same as the dense path).
        domain: shared (unbatched) exploration domain.
    Returns (S, K, K) phi_k, normalized with the dense path's exact
    degenerate fallback (uniform over the lattice).
    """
    from ergodic_exploration_tpu.ops import basis

    S, h, w = data.shape[0], g0.shape[0], g0.shape[1]
    if data.shape[1] != h:
        raise ValueError(f"data rows {data.shape[1]} != grid height {h}")
    nsx, nsy = grid_samples
    r = sensor_radius_cells
    if sc is None:
        sc = _pick_sc(S, h, -(-w // 128) * 128, frontier_cells)
    if S % sc:
        raise ValueError(f"S={S} not divisible by sc={sc}")
    Kp = 128  # padded K: same MXU cost as any width <= 128
    if K > Kp:
        raise ValueError(f"K={K} > {Kp} unsupported by the MI kernel")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    wp = -(-w // 128) * 128
    BxT, cxA, cyA, cosx, cosy = mi_operands(
        g0, domain, K, grid_samples, r, Kp, wp)

    # lane-pad the beliefs once in XLA (a contiguous last-dim pad, ~BW-rate;
    # minor-dim-100 Pallas blocks measured ~8x off the DMA floor on v5e) —
    # unless the caller already carries the padded layout. Margin VALUES are
    # irrelevant either way: every matrix row/col beyond the true width is
    # zero, so the margin contributes exactly nothing.
    if data.shape[-1] == wp:
        datap = data
    elif data.shape[-1] == w:
        datap = jnp.pad(data, ((0, 0), (0, 0), (0, wp - w)),
                        constant_values=1.0)
    else:
        raise ValueError(
            f"belief width {data.shape[-1]} is neither the grid width {w} "
            f"nor its lane-padded width {wp}")

    fc = frontier_cells
    in_specs = [
        pl.BlockSpec((sc * h, wp), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wp, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [datap.reshape(S * h, wp), BxT, cxA, cyA]
    if fc > 0:
        from ergodic_exploration_tpu.ops import target as target_ops

        FxT = jnp.zeros((wp, wp), jnp.float32).at[:w, :w].set(
            target_ops.blur_count_matrix(w, fc).T)
        in_specs.append(pl.BlockSpec((wp, wp), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(FxT)
    out = pl.pallas_call(
        _make_kernel(sc, h, w, wp, K, Kp, r, occupied_threshold,
                     eps, blur_mode if r > 0 else "rolls", fc=fc,
                     _ablate=_ablate),
        grid=(S // sc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((K, sc * Kp), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, S * Kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*operands)

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

"""Fused Pallas solve kernel: one program = one scenario tile's full ergodic
descent step (SURVEY.md section 4.2 steps 3-6).

The vmapped XLA path runs the per-tick pipeline as dozens of small kernels
whose operands put tiny axes (state dim 3, controls 2-4, basis K=10) on TPU
lanes — measured at S=4096: rollout 1.6 ms + basis/gradient 2.5 ms +
barrier 1.7 ms + co-state 1.1 ms, all overhead, not flops. This kernel runs
the whole chain VMEM-resident in the TRANSPOSED layout (scenario axis on
lanes, the ops/pallas_kernels.py lesson):

    rollout (RK4, H steps)  ->  cosine tables at the knots
    -> c_k roll sum         ->  ergodic gradient
    -> boundary + obstacle barrier (bilinear hat contractions against the
       per-scenario distance-field patch)
    -> backward co-state RK4 ->  u = clip(-R^-1 B^T rho)

Everything is elementwise/VPU work on (..., tile) arrays; there is no MXU
shape here (K, H, nu are all tiny), which is exactly why the XLA version
was dispatch-bound.

Both models fit one kernel: cart and omni are "body twist = static mixing
rows (Mx, My, Mw) @ u, rotated by theta" (models/cart.py, models/omni.py),
so A^T rho and B^T rho have closed forms in (cos th, sin th).

Numerical contract: identical math to ErgodicController.step (fp32
accumulation everywhere; the XLA path's HIGHEST matmuls are plain fp32
adds/muls here). Parity is pinned by tests/test_solve_kernel.py.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ergodic_exploration_tpu.ops.patch import FAR  # scalar: fine to close over

# Shared-draw history-reduction strategy: "broadcast" (VPU multiply-reduce,
# round-3 choice) or "gemm" (batched narrow matmul, no big intermediate) —
# A/B-able on hardware (tools/tpu_histred.py); value parity ~1e-7 either way.
_HIST_RED_MODE = "broadcast"


@dataclass(frozen=True)
class SolveParams:
    """Static (hashable) parameters closed over by the kernel."""

    H: int
    K: int
    nu: int
    P: int  # patch cells
    nb: int  # sampled-history batch folded into the kernel (0 = precomputed)
    dt: float
    gamma: float  # ergodic weight
    beta: float  # barrier weight
    b_eps: float
    b_weight: float  # boundary barrier weight
    o_weight: float  # obstacle barrier weight
    b_radius: float
    d_safe: float
    d_min: float
    r_inv: Tuple[float, ...]
    u_min: Tuple[float, ...]
    u_max: Tuple[float, ...]
    mx: Tuple[float, ...]  # body-twist mixing rows: vx = mx @ u, ...
    my: Tuple[float, ...]
    mw: Tuple[float, ...]
    # shared-map in-kernel patch extraction (cfg.shared_maps): when nonzero,
    # the three (P, P, S) patch operands are replaced by three (map_w, map_h)
    # bf16 chunks of the SHARED distance map's transpose and the patch +
    # gradient are built inside the kernel (no XLA extraction, no (S, P, P)
    # transposes, no patch HBM round trip)
    map_h: int = 0
    map_w: int = 0
    # in-kernel GMM target refresh (round-4 one-kernel tick): when J > 0 the
    # phik operand is replaced by transposed GMM parameters + the (chunked)
    # sample lattice and dense basis table, the grid gains an inner
    # "arbitrary" lattice-chunk axis, and phi_k accumulates in VMEM scratch
    # — SURVEY.md section 4.2 steps 1-7 as ONE Pallas program. masked:
    # free-space mask folded into the D table (engine shared_maps fold);
    # the normalizer then repairs via the k=(0,0) coefficient.
    J: int = 0
    chunk: int = 1024
    masked_refresh: bool = False
    # tile-predicated DWA: skip the candidate sweep for scenario tiles with
    # no crashing validation code. u_dwa / feasible for non-crashed lanes
    # are don't-cares (u_cmd ignores them); dwa_feasible is meaningful only
    # where dwa_active. Default OFF: on the obstacle-rich bench world
    # nearly every 128-lane tile has a crashing lane, so the predicate is
    # pure overhead — alternating A/B measured eager 3.538 vs lazy
    # 3.610 ms/tick over 4 reps (tools/tpu_ab_lazy.py, v5e S=4096). Turn
    # on for open-map fleets where whole tiles run crash-free.
    lazy_dwa: bool = False


def model_rows(model):
    """(Mx, My, Mw) static mixing rows for a cart/omni model."""
    from ergodic_exploration_tpu.models.cart import Cart
    from ergodic_exploration_tpu.models.omni import Omni, _SX, _SY, _SW

    if isinstance(model, Cart):
        r, b = model.wheel_radius, model.wheel_base
        return (0.5 * r, 0.5 * r), (0.0, 0.0), (-r / b, r / b)
    if isinstance(model, Omni):
        r = model.wheel_radius
        L = model.lx + model.ly
        return (
            tuple(0.25 * r * s for s in _SX),
            tuple(0.25 * r * s for s in _SY),
            tuple(0.25 * r / L * s for s in _SW),
        )
    raise TypeError(f"fused solve supports cart/omni, got {type(model)!r}")


def params_from_config(cfg) -> SolveParams:
    from ergodic_exploration_tpu.models import make_model

    mx, my, mw = model_rows(make_model(cfg))
    return SolveParams(
        H=cfg.horizon, K=cfg.num_basis, nu=cfg.nu, P=cfg.patch_cells, nb=0,
        dt=cfg.dt, gamma=cfg.ergodic_weight, beta=cfg.barrier_weight,
        b_eps=cfg.barrier_eps, b_weight=cfg.barrier_boundary_weight,
        o_weight=cfg.barrier_obstacle_weight, b_radius=cfg.boundary_radius,
        d_safe=cfg.d_safe, d_min=0.03,
        r_inv=tuple(1.0 / r for r in cfg.r_diag),
        u_min=tuple(cfg.u_min), u_max=tuple(cfg.u_max),
        mx=mx, my=my, mw=mw,
    )


def _wrap(th):
    """Heading wrap to (-pi, pi] — identical to utils.numerics.normalize_angle."""
    return jnp.pi - jnp.mod(jnp.pi - th, 2.0 * jnp.pi)


def _make_kernel(sp: SolveParams, sps: "SafetyParams | None" = None):
    """Fused descent-step kernel; with ``sps`` the SAFETY stage (emitted-
    control validation + DWA sweep) runs IN THE SAME PROGRAM on the static
    central crop of the already-VMEM-resident patch — no second kernel
    launch, no crop staging through HBM, and u0 never round-trips
    (round-3 ablation: the separate safety stage cost ~1.2 ms/tick)."""
    H, K, nu, P, nb = sp.H, sp.K, sp.nu, sp.P, sp.nb
    dt = float(sp.dt)

    def kernel(*refs):
        it = iter(refs)
        x_r = next(it)
        u_r = next(it)
        hist_r = next(it)
        nh_r = next(it)
        if sp.J:  # in-kernel refresh operands replace phik
            mx_r, my_r, ia_r, ib_r, ic_r, nr_r = (next(it) for _ in range(6))
            pts_r, dt_r, mck_r = next(it), next(it), next(it)
            phik_r = None
        else:
            phik_r = next(it)
        pd_r, pgx_r, pgy_r = next(it), next(it), next(it)
        ps_r, po_r, pr_r, do_r, dl_r, cks_r = (next(it) for _ in range(6))
        if sps is None:
            vb_r = None
            un_r, met_r, bc_r, cko_r = (next(it) for _ in range(4))
        else:
            vb_r = next(it)
            un_r, met_r, bc_r, cko_r = (next(it) for _ in range(4))
            code_r, udwa_r, feas_r = next(it), next(it), next(it)
        T = x_r.shape[-1]

        # ---- in-kernel target refresh (sp.J): the per-tick GMM phi_k
        # reduction over the 10k-sample lattice runs HERE, VMEM-resident —
        # SURVEY.md section 4.2 step 1 folded into the same program as
        # steps 2-7. phi is evaluated chunk-by-chunk (static unrolled
        # slices; one (chunk, T) sheet live at a time) and contracted
        # against the resident transposed D table on the MXU. Math matches
        # engine._phik_from_gmm_fn's shared-maps fold exactly (free-space
        # mask folded into D at trace time, k=(0,0) renormalizer, mask_ck
        # degenerate fallback) — see replan_batched_fused for the algebra.
        if sp.J:
            Npad = dt_r.shape[-1]
            acc = jnp.zeros((K * K, T), jnp.float32)
            tot = jnp.zeros((1, T), jnp.float32)
            for k0 in range(0, Npad, sp.chunk):
                sl = slice(k0, k0 + sp.chunk)
                px_c = pts_r[0, sl]  # (chunk,)
                py_c = pts_r[1, sl]
                phi = jnp.zeros((sp.chunk, T), jnp.float32)
                for c in range(sp.J):
                    dx = px_c[:, None] - mx_r[c, :][None, :]  # (chunk, T)
                    dy = py_c[:, None] - my_r[c, :][None, :]
                    q = (ia_r[c, :][None, :] * dx * dx
                         + 2.0 * ib_r[c, :][None, :] * dx * dy
                         + ic_r[c, :][None, :] * dy * dy)
                    phi = phi + nr_r[c, :][None, :] * jnp.exp(-0.5 * q)
                tot = tot + jnp.sum(phi, axis=0, keepdims=True)
                acc = acc + jax.lax.dot(
                    dt_r[:, sl], phi,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            tot_s = jnp.maximum(tot, 1e-12)
            if sp.masked_refresh:
                # ck = acc / (h00 * acc[(0,0)]), fallback mask_ck — the
                # normalize-by-tot and divide-by-(h00 ck[0,0]) steps of the
                # XLA fold collapse (tot cancels); the degenerate tests
                # reproduce engine._renorm's exact thresholds.
                h00 = jnp.sqrt(dl_r[0, :] * dl_r[1, :])[None, :]  # (1, T)
                ok = (tot > 1e-12) & (h00 * acc[0:1, :] / tot_s > 1e-12)
                phik_flat = jnp.where(
                    ok, acc / jnp.maximum(h00 * acc[0:1, :], 1e-30), mck_r[:, :]
                )
            else:
                phik_flat = jnp.where(tot > 1e-12, acc / tot_s, mck_r[:, :])
        else:
            phik_flat = phik_r[:, :]
        # basis constants built in-kernel from iota (pallas kernels cannot
        # capture array constants): Sobolev weights Lambda_k and the
        # normalization factor sqrt(c(k1) c(k2)) (basis.lambda_weights /
        # basis.hk_norm)
        k1g = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 0).astype(jnp.float32)
        k2g = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 1).astype(jnp.float32)
        lam_c = (1.0 + k1g * k1g + k2g * k2g) ** -1.5  # (K, K, 1)
        c1 = jnp.where(k1g == 0.0, 1.0, 0.5)
        c2 = jnp.where(k2g == 0.0, 1.0, 0.5)
        sqc_c = jnp.sqrt(c1 * c2)
        k_c = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0).astype(jnp.float32)[:, 0]  # (K,)

        # ---- 0. patch: in-kernel extraction from the SHARED map, or the
        # precomputed (P, P, T) operands. Shared-map path (cfg.shared_maps):
        # row select rides the MXU — the fp32 map is pre-split into three
        # bf16 chunks (fp32 == hi + mid + lo exactly; the one-hot RHS is
        # bf16-exact), so three DEFAULT-precision dots reconstruct the XLA
        # path's HIGHEST-precision selection. Column select + the central-
        # difference gradient (ops/patch.py extract_patch semantics,
        # one-sided edges, FAR plateau zeroed) are VPU work on the
        # (P, map_w, T) row slab. ----
        if sp.map_h:
            mh, mw_ = sp.map_h, sp.map_w
            ih = jax.lax.broadcasted_iota(jnp.int32, (mh, 1), 0).astype(jnp.float32)
            rows_sel = []
            for py in range(P):
                r = jnp.clip(ps_r[1, :] + float(py), 0.0, float(mh - 1))  # (T,)
                # chunks + one-hot are bf16-exact f32 values, so the MXU's
                # DEFAULT-precision bf16 input rounding is LOSSLESS here
                # (and CPU interpret runs a plain f32 dot)
                oh = (ih == r[None, :]).astype(jnp.float32)  # (mh, T)
                rs = None
                for mr in (pd_r, pgx_r, pgy_r):  # hi/mid/lo chunks (mw, mh)
                    d = jnp.dot(mr[:, :], oh, preferred_element_type=jnp.float32)
                    rs = d if rs is None else rs + d
                rows_sel.append(rs)  # (mw, T)
            RS = jnp.stack(rows_sel)  # (P, mw, T)
            iw = jax.lax.broadcasted_iota(jnp.int32, (1, mw_, 1), 1).astype(jnp.float32)
            cols = []
            for px in range(P):
                c = jnp.clip(ps_r[0, :] + float(px), 0.0, float(mw_ - 1))
                ohx = (iw == c[None, None, :]).astype(jnp.float32)  # (1, mw, T)
                cols.append(jnp.sum(RS * ohx, axis=1))  # (P, T)
            pd = jnp.stack(cols, axis=1)  # (P, P, T) [iy, ix, t]
            inv = 1.0 / pr_r[0, :]  # (T,)
            i2 = 0.5 * inv
            gx = jnp.concatenate([
                (pd[:, 1:2] - pd[:, 0:1]) * inv[None, None, :],
                (pd[:, 2:] - pd[:, :-2]) * i2[None, None, :],
                (pd[:, -1:] - pd[:, -2:-1]) * inv[None, None, :],
            ], axis=1)
            gy = jnp.concatenate([
                (pd[1:2] - pd[0:1]) * inv[None, None, :],
                (pd[2:] - pd[:-2]) * i2[None, None, :],
                (pd[-1:] - pd[-2:-1]) * inv[None, None, :],
            ], axis=0)
            far = pd >= FAR  # ops/patch.py FAR plateau
            pgx = jnp.where(far, 0.0, gx)
            pgy = jnp.where(far, 0.0, gy)
        else:
            pd = pd_r[:, :, :]
            pgx = pgx_r[:, :, :]
            pgy = pgy_r[:, :, :]

        def twist(u_t):  # u_t: (nu, T) -> vx, vy, w each (T,)
            vx = sum(sp.mx[i] * u_t[i] for i in range(nu))
            vy = sum(sp.my[i] * u_t[i] for i in range(nu))
            w = sum(sp.mw[i] * u_t[i] for i in range(nu))
            return vx, vy, w + jnp.zeros((T,), jnp.float32)

        # ---- 1. RK4 rollout; knots x_0..x_{H-1} ----
        px, py, th = x_r[0, :], x_r[1, :], x_r[2, :]
        kx, ky, kth = [], [], []
        for t in range(H):
            u_t = u_r[t]
            vx, vy, w = twist(u_t)
            kx.append(px)
            ky.append(py)
            kth.append(th)

            def deriv(a_th):
                c = jnp.cos(a_th)
                s = jnp.sin(a_th)
                return vx * c - vy * s, vx * s + vy * c

            d1x, d1y = deriv(th)
            d2x, d2y = deriv(th + 0.5 * dt * w)
            d4x, d4y = deriv(th + dt * w)
            # theta-dot is constant (= w), so k2 == k3 for x/y stages' theta
            px = px + (dt / 6.0) * (d1x + 4.0 * d2x + d4x)
            py = py + (dt / 6.0) * (d1y + 4.0 * d2y + d4y)
            th = _wrap(th + dt * w)
        KX = jnp.stack(kx)  # (H, T)
        KY = jnp.stack(ky)
        KTH = jnp.stack(kth)

        # ---- 2. cosine tables at the knots (basis.tables) ----
        # Chebyshev recurrence cos/sin(k theta) = 2 cos(theta) {c,s}_{k-1}
        # - {c,s}_{k-2}: 2 transcendentals per (H, T) sheet instead of
        # 2 K — transcendental vreg-ops dominated this section (round-3
        # kernel profile); recurrence error at K=10 is ~1e-6, far inside
        # the 5e-5 fused-vs-vmapped parity budget.
        Lx, Ly = dl_r[0, :], dl_r[1, :]  # (T,)
        relx = KX - do_r[0, :][None, :]
        rely = KY - do_r[1, :][None, :]
        f1 = (jnp.pi * k_c)[:, None] / Lx[None, :]  # (K, T) gradient scales
        f2 = (jnp.pi * k_c)[:, None] / Ly[None, :]

        def cheb(theta, axis):
            """cos/sin(k*theta) for k = 0..K-1, stacked on ``axis``."""
            c1, s1 = jnp.cos(theta), jnp.sin(theta)
            C = [jnp.ones_like(theta), c1]
            Sn = [jnp.zeros_like(theta), s1]
            for _ in range(2, K):
                C.append(2.0 * c1 * C[-1] - C[-2])
                Sn.append(2.0 * c1 * Sn[-1] - Sn[-2])
            return jnp.stack(C[:K], axis=axis), jnp.stack(Sn[:K], axis=axis)

        Cx, Sx = cheb(relx * (jnp.pi / Lx)[None, :], 1)  # (H, K, T)
        Cy, Sy = cheb(rely * (jnp.pi / Ly)[None, :], 1)
        hk = jnp.sqrt(Lx * Ly)[None, None, :] * sqc_c  # (K, K, T)

        # ---- 3. c_k over [history || rollout] (basis.coefficients) ----
        roll = jnp.sum(Cx[:, :, None, :] * Cy[:, None, :, :], axis=0) / hk
        M = nh_r[0, :] + float(H)  # (T,)
        if nb:
            # in-kernel history reduction over the COMPACTED sampled batch
            # (controller.step step 2, ring+batch branch): cos tables of the
            # nb sampled positions + the (K, K) outer-product accumulation,
            # all VPU work on (nb, K, T) tiles — replaces the vmapped XLA
            # stage whose per-scenario (nb, K) matmuls were dispatch-bound.
            bx = hist_r[0, :, :] - do_r[0, :][None, :]  # (nb, T)
            by = hist_r[1, :, :] - do_r[1, :][None, :]
            Hx, _ = cheb(bx * (jnp.pi / Lx)[None, :], 1)  # (nb, K, T)
            Hy, _ = cheb(by * (jnp.pi / Ly)[None, :], 1)
            hsum = jnp.concatenate(
                [jnp.sum(Hx[:, k1:k1 + 1, :] * Hy, axis=0) for k1 in range(K)]
            ).reshape(K, K, T)
            wv = (nh_r[0, :] > 0.0).astype(jnp.float32)  # empty-buffer guard
            hist_kk = hsum * wv[None, None, :] / hk
        else:
            hist_kk = hist_r[:, :].reshape(K, K, T)
        ck = (hist_kk + roll) / M[None, None, :]
        dkk = ck - phik_flat.reshape(K, K, T)
        met_r[0, :] = jnp.sum(lam_c * dkk * dkk, axis=(0, 1))

        # ---- 4. ergodic gradient at the knots (basis.ergodic_gradient) ----
        Wh = lam_c * dkk / hk  # (K, K, T)
        P1 = jnp.sum(Wh[None, :, :, :] * Cy[:, None, :, :], axis=2)  # (H, K, T)
        P2 = jnp.sum(Wh[None, :, :, :] * Cx[:, :, None, :], axis=1)  # (H, K, T)
        scale = (2.0 / M)[None, :]
        ex = -scale * jnp.sum(Sx * f1[None, :, :] * P1, axis=1)  # (H, T)
        ey = -scale * jnp.sum(Sy * f2[None, :, :] * P2, axis=1)

        # ---- 5. barrier: boundary walls + obstacle patch queries ----
        lox = do_r[0, :] + sp.b_eps
        hix = do_r[0, :] + Lx - sp.b_eps
        loy = do_r[1, :] + sp.b_eps
        hiy = do_r[1, :] + Ly - sp.b_eps
        ovx = jnp.maximum(KX - hix[None, :], 0.0)
        unx = jnp.maximum(lox[None, :] - KX, 0.0)
        ovy = jnp.maximum(KY - hiy[None, :], 0.0)
        uny = jnp.maximum(loy[None, :] - KY, 0.0)
        bval = sp.b_weight * (ovx**2 + unx**2 + ovy**2 + uny**2)  # (H, T)
        bgx = 2.0 * sp.b_weight * (ovx - unx)
        bgy = 2.0 * sp.b_weight * (ovy - uny)

        # local fractional patch coords (PatchField._local_frac)
        res = pr_r[0, :][None, :]
        fx = (KX - po_r[0, :][None, :]) / res - 0.5 - ps_r[0, :][None, :]
        fy = (KY - po_r[1, :][None, :]) / res - 0.5 - ps_r[1, :][None, :]
        fx = jnp.clip(fx, 0.0, P - 1.001)
        fy = jnp.clip(fy, 0.0, P - 1.001)
        cells = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(jnp.float32)  # (P, 1)
        o_vals, o_gx, o_gy = [], [], []
        for t in range(H):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[t][None, :] - cells))  # (P, T)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[t][None, :] - cells))
            # bilinear: sum_a wy[a] * sum_b patch[a, b] * wx[b]
            row_d = jnp.sum(pd * wx[None, :, :], axis=1)  # (P, T)
            row_x = jnp.sum(pgx * wx[None, :, :], axis=1)
            row_y = jnp.sum(pgy * wx[None, :, :], axis=1)
            dv = jnp.sum(wy * row_d, axis=0)  # (T,)
            gvx = jnp.sum(wy * row_x, axis=0)
            gvy = jnp.sum(wy * row_y, axis=0)
            # obstacle_barrier (ops/barrier.py)
            d = jnp.maximum(dv - sp.b_radius, sp.d_min)
            active = d < sp.d_safe
            diff = jnp.where(active, 1.0 / d - 1.0 / sp.d_safe, 0.0)
            o_vals.append(sp.o_weight * diff * diff)
            dvdd = jnp.where(active, -2.0 * sp.o_weight * diff / (d * d), 0.0)
            o_gx.append(dvdd * gvx)
            o_gy.append(dvdd * gvy)
        bval = bval + jnp.stack(o_vals)
        bgx = bgx + jnp.stack(o_gx)
        bgy = bgy + jnp.stack(o_gy)
        bc_r[0, :] = jnp.mean(bval, axis=0)

        # ---- 6. backward co-state RK4 + control update ----
        g1 = sp.gamma * ex + sp.beta * bgx  # (H, T)
        g2 = sp.gamma * ey + sp.beta * bgy
        r1 = jnp.zeros((T,), jnp.float32)
        r2 = jnp.zeros((T,), jnp.float32)
        r3 = jnp.zeros((T,), jnp.float32)
        u_new = [None] * H
        for t in range(H - 1, -1, -1):
            u_t = u_r[t]
            vx, vy, w = twist(u_t)
            c = jnp.cos(KTH[t])
            s = jnp.sin(KTH[t])
            a13 = -vx * s - vy * c
            a23 = vx * c - vy * s

            # rho integrates rho_dot = g + A^T rho backward (integrator.py):
            # A^T rho = (0, 0, a13 r1 + a23 r2), so r1/r2 have the constant
            # rates g1/g2 and the classical RK4 stages collapse (k3 == k2):
            # r3 += dt/6 (k1 + 4 k2 + k4), r1 += dt g1, r2 += dt g2.
            j1 = g1[t]
            j2 = g2[t]
            k1 = a13 * r1 + a23 * r2
            k2 = a13 * (r1 + 0.5 * dt * j1) + a23 * (r2 + 0.5 * dt * j2)
            k4 = a13 * (r1 + dt * j1) + a23 * (r2 + dt * j2)
            r3 = r3 + (dt / 6.0) * (k1 + 4.0 * k2 + k4)
            r1 = r1 + dt * j1
            r2 = r2 + dt * j2

            # u = clip(-R^-1 B^T rho); B^T rho via the rotated mixing rows
            p = c * r1 + s * r2
            q = -s * r1 + c * r2
            cols = []
            for i in range(nu):
                bt = sp.mx[i] * p + sp.my[i] * q + sp.mw[i] * r3
                cols.append(jnp.clip(-sp.r_inv[i] * bt,
                                     sp.u_min[i], sp.u_max[i]))
            u_new[t] = jnp.stack(cols)  # (nu, T)
        un_r[:, :, :] = jnp.stack(u_new)  # (H, nu, T)

        # ---- 7. running basis-sum append (controller.step step 9): the
        # accumulate-mode ck_sum gains F_k at the CURRENT pose — folded here
        # so no separate vmapped XLA stage touches (S, K, K) per tick ----
        cnx, _ = cheb((x_r[0, :] - do_r[0, :]) * (jnp.pi / Lx), 0)  # (K, T)
        cny, _ = cheb((x_r[1, :] - do_r[1, :]) * (jnp.pi / Ly), 0)
        cko_r[:, :] = cks_r[:, :] + (
            cnx[:, None, :] * cny[None, :, :] / hk
        ).reshape(K * K, T)

        # ---- 8. merged safety stage (validation + DWA) on the static
        # central crop of the SAME VMEM-resident patch. With sp.lazy_dwa
        # the candidate sweep runs only for tiles where some lane's
        # validation code crashed (the sweep is ~40% of the kernel on open
        # maps); u_dwa/feasible for non-crashed lanes are don't-cares. ----
        if sps is not None:
            o = (P - sps.Pc) // 2  # PatchField.center_crop offset
            u0 = [u_new[0][i] for i in range(nu)]
            G = _safety_geom(
                sps, x_r, pd[o:o + sps.Pc, o:o + sps.Pc, :],
                ps_r[0, :] + float(o), ps_r[1, :] + float(o),
                po_r, pr_r, do_r, dl_r)
            code, tw0 = _validate_u0(sps, G, u0)
            code_r[0, :] = code
            if sp.lazy_dwa:
                udwa_r[:, :] = jnp.zeros_like(udwa_r)
                feas_r[0, :] = jnp.ones((T,), jnp.int32)

                @pl.when(jnp.any(code >= 2))
                def _():
                    udwa, feasible = _dwa_sweep(sps, G, vb_r, u0, tw0)
                    feas_r[0, :] = feasible.astype(jnp.int32)
                    for i in range(nu):
                        udwa_r[i, :] = udwa[i]
            else:
                udwa, feasible = _dwa_sweep(sps, G, vb_r, u0, tw0)
                feas_r[0, :] = feasible.astype(jnp.int32)
                for i in range(nu):
                    udwa_r[i, :] = udwa[i]

    return kernel


def _fused_call(sp: SolveParams, sps, x, U, hist, nh, phik, pd, pgx, pgy,
                pstart, porigin, pres, dorigin, dlen, cks, vb,
                tile, interpret, refresh_ops):
    """Shared pallas_call builder for :func:`fused_solve` (sps=None) and
    :func:`fused_solve_safety`. With ``refresh_ops`` (sp.J > 0) the phik
    operand is REPLACED by the in-kernel GMM refresh operands:
    (mx, my, ia, ib, ic, nr) each (J, S) transposed parameters, ptsT
    (2, Npad) padded lattice, DT (K^2, Npad) transposed (mask-folded) dense
    basis table, mask_ck (K^2, 1) degenerate fallback — pts/DT/mask_ck are
    scenario-invariant full blocks, resident across tiles."""
    S = x.shape[-1]
    while S % tile != 0:
        tile //= 2
    if tile < 1:
        raise ValueError(f"S={S} has no power-of-two tile")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, K, nu, P = sp.H, sp.K, sp.nu, sp.P

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(dims + (tile,),
                            (lambda i, _nd=nd: (0,) * _nd + (i,)),
                            memory_space=pltpu.VMEM)

    def full(*dims):
        nd = len(dims)
        return pl.BlockSpec(dims, (lambda i, _nd=nd: (0,) * _nd),
                            memory_space=pltpu.VMEM)

    hist_spec = spec(2, sp.nb) if sp.nb else spec(K * K)
    if sp.map_h:  # shared-map chunks: full (map_w, map_h) block every tile
        patch_specs = [full(sp.map_w, sp.map_h)] * 3
    else:
        patch_specs = [spec(P, P), spec(P, P), spec(P, P)]
    if sp.J:
        assert refresh_ops is not None and len(refresh_ops) == 9
        Npad = refresh_ops[6].shape[-1]
        if Npad % sp.chunk:
            raise ValueError(f"lattice pad {Npad} not a multiple of chunk {sp.chunk}")
        target_ops = list(refresh_ops)
        target_specs = ([spec(sp.J)] * 6
                        + [full(2, Npad), full(K * K, Npad), full(K * K, 1)])
    else:
        target_ops = [phik]
        target_specs = [spec(K * K)]

    in_specs = [spec(3), spec(H, nu), hist_spec, spec(1), *target_specs,
                *patch_specs,
                spec(2), spec(2), spec(1), spec(2), spec(2), spec(K * K)]
    operands = [x, U, hist, nh, *target_ops, pd, pgx, pgy,
                pstart, porigin, pres, dorigin, dlen, cks]
    out_specs = [spec(H, nu), spec(1), spec(1), spec(K * K)]
    out_shape = [
        jax.ShapeDtypeStruct((H, nu, S), jnp.float32),
        jax.ShapeDtypeStruct((1, S), jnp.float32),
        jax.ShapeDtypeStruct((1, S), jnp.float32),
        jax.ShapeDtypeStruct((K * K, S), jnp.float32),
    ]
    if sps is not None:
        in_specs.append(spec(3))
        operands.append(vb)
        out_specs += [spec(1), spec(nu), spec(1)]
        out_shape += [
            jax.ShapeDtypeStruct((1, S), jnp.int32),
            jax.ShapeDtypeStruct((nu, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.int32),
        ]
    return pl.pallas_call(
        _make_kernel(sp, sps),
        grid=(S // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*operands)


def fused_solve(sp: SolveParams, x, U, hist, nh, phik, pd, pgx, pgy,
                pstart, porigin, pres, dorigin, dlen, cks,
                tile: int = 128, interpret=None, refresh_ops=None):
    """Run the fused descent step. All operands are TRANSPOSED (scenario
    last): x (3,S), U (H,nu,S), phik/cks (K^2,S), nh/pres (1,S),
    pd/pgx/pgy (P,P,S), pstart/porigin/dorigin/dlen (2,S).

    ``hist`` is (K^2, S) precomputed history-coefficient sums when
    ``sp.nb == 0``, or the (2, nb, S) compacted sampled positions when
    ``sp.nb > 0`` (the cos tables + outer-product reduction then run
    in-kernel). ``cks`` is the running basis sum, appended in-kernel.
    ``refresh_ops`` (with sp.J > 0): in-kernel GMM target refresh operands
    replacing ``phik`` (pass phik=None) — see :func:`_fused_call`.

    Returns (U_new (H,nu,S), metric (1,S), barrier_mean (1,S),
    ck_sum_new (K^2,S)).
    """
    return _fused_call(sp, None, x, U, hist, nh, phik, pd, pgx, pgy,
                       pstart, porigin, pres, dorigin, dlen, cks, None,
                       tile, interpret, refresh_ops)


def fused_solve_safety(sp: SolveParams, sps: "SafetyParams", x, U, hist, nh,
                       phik, pd, pgx, pgy, pstart, porigin, pres, dorigin,
                       dlen, cks, vb, tile: int = 128, interpret=None,
                       refresh_ops=None):
    """:func:`fused_solve` + the SAFETY stage (validation + DWA) in ONE
    pallas program: the safety window is the static central crop of the
    VMEM-resident patch, u0 feeds the validator in-register, and the
    second kernel launch + crop staging disappear. Extra operand: vb (3,S).
    Extra outputs: code (1,S) i32, u_dwa (nu,S), feasible (1,S) i32.
    Requires sps.Pc <= sp.P (crop inside the patch)."""
    if sps.Pc > sp.P:
        raise ValueError(f"safety crop {sps.Pc} exceeds patch {sp.P}")
    return _fused_call(sp, sps, x, U, hist, nh, phik, pd, pgx, pgy,
                       pstart, porigin, pres, dorigin, dlen, cks, vb,
                       tile, interpret, refresh_ops)


def shared_map_vmem_bytes(cfg, map_h: int, map_w: int, tile: int) -> int:
    """Scoped-VMEM footprint (bytes) of the in-kernel shared-map patch
    extraction: three (map_w, map_h) f32 chunks + the (P, map_w, tile) row
    slab + the (P, P, tile) patch/gradient tiles. Used to gate the path —
    a too-large map would otherwise fail at Mosaic compile with an opaque
    scoped-VMEM error (ADVICE r3)."""
    P = cfg.patch_cells
    return 4 * (3 * map_w * map_h + P * map_w * tile + 3 * P * P * tile)


# Scoped-VMEM budget for the shared-map operands alone; the rest of the
# merged kernel needs ~6-8 MB of the 16 MB limit at tile=128 (measured: the
# 100x100 bench map + tile 512 OOMs at 26.6 MB, tile 128 fits comfortably).
_SHARED_MAP_VMEM_BUDGET = 6 * 1024 * 1024


def replan_batched_fused(cfg, model, state, x, vb, phik, world,
                         gmm=None, domain=None):
    """One batched replan tick with the fused kernel as the descent core —
    drop-in for ``jax.vmap(ErgodicController.step)`` (same signature modulo
    the leading scenario axis; semantics pinned by tests/test_solve_kernel).

    XLA stages (patch extraction, history sampling, safety, state update)
    sandwich the Pallas core exactly as ``ErgodicController.step`` orders
    them (SURVEY.md section 4.2).

    With ``gmm`` + (unbatched) ``domain`` instead of ``phik`` (pass
    phik=None; requires cfg.shared_maps), the per-tick GMM TARGET REFRESH
    runs INSIDE the kernel too — the reference's full tick (SURVEY.md
    section 4.2 steps 1-7) as one Pallas program. The free-space mask is
    folded into the dense basis table at trace time (the engine's
    shared-maps fold; identical normalization algebra, see _make_kernel).
    """
    from ergodic_exploration_tpu.controller import (ControllerState,
                                                    StepDiagnostics,
                                                    orbit_guard)
    from ergodic_exploration_tpu.ops import basis
    from ergodic_exploration_tpu.ops.collision import CRASH, validate_control
    from ergodic_exploration_tpu.ops.dwa import dwa_control
    from ergodic_exploration_tpu.ops.patch import extract_patch

    S = x.shape[0]
    K = cfg.num_basis
    H = cfg.horizon
    bdom = world.domain  # batched leaves (S, ...)

    # Orbit guard (controller.step step 0): runs in XLA ahead of the kernel
    # — a one-hot read of the pose W ticks back, then a where on U — so the
    # kernel program is untouched and parity with the vmapped path is by
    # construction (tests/test_solve_kernel.py). Under shared_history_draw
    # the read PIGGYBACKS on the history-compaction GEMM below (one extra
    # one-hot column — ~free vs the ~0.09 ms standalone batched contraction
    # measured round 5); other branches pay the standalone read.
    guard_piggyback = (
        cfg.orbit_window > 0
        and cfg.shared_history_draw
        and cfg.history == "ring"
        and bool(cfg.buffer_batch)
    )
    if cfg.orbit_window > 0 and not guard_piggyback:
        orbiting = jax.vmap(lambda b, p: orbit_guard(cfg, b, p))(
            state.buffer, x[:, :2]
        )  # (S,)
    elif cfg.orbit_window <= 0:
        orbiting = jnp.zeros((S,), dtype=bool)
    # U_warm is finalized after the compaction section when piggybacking.

    shared_maps = cfg.shared_maps
    if shared_maps:
        mh_, mw_ = world.dist.dist.shape[-2:]
        if shared_map_vmem_bytes(cfg, mh_, mw_, cfg.solve_tile) > _SHARED_MAP_VMEM_BUDGET:
            # Map too large for the in-kernel extraction's VMEM footprint:
            # fall back to the XLA one-hot patch path (same semantics;
            # ADVICE r3 — previously an opaque Mosaic scoped-VMEM error).
            shared_maps = False
    if shared_maps:
        # In-kernel patch extraction (cfg.shared_maps promises identical
        # maps across scenarios): ship the shared map once as three bf16
        # chunks (fp32 == hi + mid + lo exactly) instead of three (S, P, P)
        # patch arrays — the XLA extraction, its transposes, and the patch
        # HBM round trip all disappear (round-3 ablation: ~0.6 ms/tick).
        patches = None
        d0 = world.dist.dist[0]
        mh, mw = d0.shape
        Pp = min(cfg.patch_cells, mh, mw)
        cf = (x[:, :2] - world.dist.origin) / world.dist.resolution[:, None] - 0.5
        start = jnp.round(cf).astype(jnp.int32) - Pp // 2  # (S, 2) (ix, iy)
        hi = d0.astype(jnp.bfloat16).astype(jnp.float32)
        mid = (d0 - hi).astype(jnp.bfloat16).astype(jnp.float32)
        lo = (d0 - hi - mid).astype(jnp.bfloat16).astype(jnp.float32)
        patch_ops = (hi.T, mid.T, lo.T)  # (mw, mh) bf16-exact f32 chunks
        patch_meta = (start.T.astype(jnp.float32), world.dist.origin.T,
                      world.dist.resolution[None, :])
    else:
        patches = jax.vmap(lambda d, c: extract_patch(d, c, cfg.patch_cells))(
            world.dist, x[:, :2]
        )

    # ---- in-kernel GMM target refresh operands (gmm + shared domain) ----
    refresh_ops = None
    refresh_extra = {}
    if gmm is not None:
        if not cfg.shared_maps or domain is None or domain.origin.ndim != 1:
            raise ValueError(
                "in-kernel refresh needs cfg.shared_maps and an unbatched domain"
            )
        from ergodic_exploration_tpu.ops import basis

        pts = domain.sample_lattice(cfg.grid_samples)  # (N, 2) shared lattice
        N = pts.shape[0]
        hk = basis.hk_norm(K, domain.lengths)
        D = basis.dense_table(basis.tables(pts, K, domain), hk)  # (N, K^2)
        m = world.free_mask
        masked = m is not None
        if masked:
            m1 = m[0] if m.ndim == 2 else m  # shared_maps: one shared mask
            D = D * m1.astype(D.dtype)[:, None]
            mask_ck = jnp.sum(D, axis=0) / jnp.maximum(jnp.sum(m1), 1.0)
        else:
            mask_ck = jnp.sum(D, axis=0) / float(N)  # uniform-over-lattice
        chunk = min(1024, -(-N // 128) * 128)
        pad = (-N) % chunk
        if pad:  # far-away pad points: phi underflows to 0, D rows are 0
            pts = jnp.concatenate([pts, jnp.full((pad, 2), 1.0e6, pts.dtype)])
            D = jnp.concatenate([D, jnp.zeros((pad, D.shape[1]), D.dtype)])
        a_c = gmm.covs[..., 0, 0]
        b_c = gmm.covs[..., 0, 1]
        c_c = gmm.covs[..., 1, 1]
        det = a_c * c_c - b_c * b_c
        refresh_ops = (
            gmm.means[..., 0].T, gmm.means[..., 1].T,  # (J, S)
            (c_c / det).T, (-b_c / det).T, (a_c / det).T,
            (gmm.weights / (2.0 * jnp.pi * jnp.sqrt(det))).T,
            pts.T, D.T, mask_ck[:, None],
        )
        refresh_extra = dict(J=gmm.means.shape[1], chunk=chunk,
                             masked_refresh=masked)

    # history over [buffer || rollout] — same three branches as the
    # controller (ring+batch / ring full-concat / accumulate). The common
    # ring+batch branch only COMPACTS the sampled positions here (one-hot
    # matmul, ops/buffer.py); their cos tables + (K, K) accumulation run
    # inside the kernel (sp.nb > 0).
    if cfg.shared_history_draw:
        # all scenarios hold the SAME key (engine init contract): one split
        # + broadcast replaces S identical threefry splits (~0.2 ms at
        # S=4096); bit-identical to the vmapped split of equal keys
        s2 = jax.random.split(state.rng[0])  # (2, key)
        rng = jnp.broadcast_to(s2[0][None], state.rng.shape)
        sub = jnp.broadcast_to(s2[1][None], state.rng.shape)
    else:
        split = jax.vmap(jax.random.split)(state.rng)  # (S, 2, key)
        rng, sub = split[:, 0], split[:, 1]

    nb = cfg.buffer_batch if (cfg.history == "ring" and cfg.buffer_batch) else 0
    if nb and cfg.shared_history_draw:
        # All scenarios share ONE index draw (engine init gives them one
        # RNG key; they tick together so counts are equal): the compaction
        # collapses to a single shared (cap, nb) one-hot against the whole
        # (S, 2, cap) buffer — one batched GEMM instead of per-scenario
        # one-hot machinery (~1.2 ms/tick at S=4096). Bit-identical to the
        # vmapped per-scenario draws under the shared key.
        #
        # The history REDUCTION also runs here in XLA (cos tables + one
        # batched (S, K, nb)@(S, nb, K) GEMM) rather than in-kernel: with
        # the compaction GEMM already batched, the in-kernel (nb, K, T)
        # cos tables + outer-product accumulation measured ~1.0 ms/tile-set
        # of pure VPU transcendentals vs ~0.3 ms of MXU work out here
        # (round-3 kernel profile). The kernel takes the precomputed
        # (K^2, S) sums (its nb == 0 path).
        from ergodic_exploration_tpu.ops.buffer import uniform01

        cap = state.buffer.states.shape[-1]  # batched leaves: (S, 2, cap)
        count0 = state.buffer.count[0]
        u = uniform01(jax.tree.map(lambda a: a[0], sub), nb)
        idx = jnp.floor(u * jnp.maximum(count0, 1).astype(u.dtype)).astype(jnp.int32)
        onehot = (idx[None, :] == jnp.arange(cap)[:, None]).astype(jnp.float32)
        if guard_piggyback:
            # one extra column selects the pose orbit_window ticks back
            # (cursor is shared under the draw contract — scenarios tick
            # together); rides the same GEMM for ~free
            ow = min(cfg.orbit_window, cap)  # controller.orbit_guard clamp
            oidx = (state.buffer.cursor[0] - ow) % cap
            ohot = (jnp.arange(cap) == oidx).astype(jnp.float32)[:, None]
            onehot = jnp.concatenate([onehot, ohot], axis=1)  # (cap, nb+1)
        # ONE flat (S*2, cap) @ (cap, nb) GEMM — the batched (2, cap) row
        # pairs fill 4x more MXU sublanes than S separate 2-row matmuls
        s_all = jnp.matmul(
            state.buffer.states.reshape(S * 2, cap), onehot,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(S, 2, -1)
        if guard_piggyback:
            prev = s_all[:, :, nb]  # (S, 2) pose ow ticks ago
            disp2 = jnp.sum((x[:, :2] - prev) ** 2, axis=-1)
            orbiting = (state.buffer.count >= ow) & (
                disp2 < cfg.orbit_eps * cfg.orbit_eps)
            s_all = s_all[:, :, :nb]
        s_buf = jnp.transpose(s_all, (0, 2, 1))  # (S, nb, 2)
        n_hist = jnp.where(state.buffer.count > 0, jnp.float32(nb), 0.0)

        def hist_red(sb, w, dom):
            hkl = basis.hk_norm(K, dom.lengths)
            Cbx, Cby = basis.cos_tables(sb, K, dom)
            if _HIST_RED_MODE == "gemm":
                # batched narrow (K, nb)@(nb, K) dot: terrible MXU fill but
                # only ~82 MFLOP total at S=4096 and — the point — NO
                # (S, nb, K, K) f32 intermediate through HBM (the
                # broadcast-reduce materialized ~164 MB; measured +0.37 ms
                # of the ring-history cost at HEAD, round-5 ablation)
                s = jnp.matmul(Cbx.T, Cby,
                               precision=jax.lax.Precision.HIGHEST)
            else:  # "broadcast" (round-3 default)
                s = jnp.sum(Cbx[:, :, None] * Cby[:, None, :], axis=0)  # (K, K)
            return s * (w / hkl)

        hist_sum = jax.vmap(hist_red)(
            s_buf, (n_hist > 0).astype(jnp.float32), bdom)  # (S, K, K)
        hist_op = hist_sum.reshape(S, K * K).T
        nb = 0  # kernel consumes the precomputed sums
    elif nb:
        s_buf, n_hist = jax.vmap(lambda b, sb: b.sample_states(nb, sb))(
            state.buffer, sub
        )  # (S, nb, 2), (S,)
        hist_op = jnp.transpose(s_buf, (2, 1, 0))  # (2, nb, S)
    else:

        def hist_one(buf, ck_sum, hist_count, sb, dom):
            hkl = basis.hk_norm(K, dom.lengths)
            if cfg.history == "ring":
                Cbx, Cby = basis.cos_tables(buf.positions, K, dom)
                w_buf = buf.sample_mask(None, sb)
                n_hist = jnp.sum(w_buf)
                return basis.coefficients_cos(Cbx, Cby, w_buf, hkl), n_hist
            return ck_sum, hist_count.astype(jnp.float32)

        hist_sum, n_hist = jax.vmap(hist_one)(
            state.buffer, state.ck_sum, state.hist_count, sub, bdom
        )
        hist_op = hist_sum.reshape(S, K * K).T

    U_warm = jnp.where(orbiting[:, None, None], 0.0, state.U)

    # ---- the fused Pallas descent core (transposed operands) ----
    # P must be the ACTUAL patch size: extract_patch clamps cfg.patch_cells
    # to the map extent (tiny FAR fields in obstacle-free worlds).
    if shared_maps:
        sp = dataclasses.replace(
            params_from_config(cfg), P=Pp, nb=nb, map_h=mh, map_w=mw,
            **refresh_extra,
        )
    else:
        sp = dataclasses.replace(
            params_from_config(cfg), P=patches.dist.shape[-1], nb=nb
        )
        patch_ops = (
            jnp.transpose(patches.dist, (1, 2, 0)),
            jnp.transpose(patches.grad[..., 0], (1, 2, 0)),
            jnp.transpose(patches.grad[..., 1], (1, 2, 0)),
        )
        patch_meta = (patches.start.T.astype(jnp.float32), patches.origin.T,
                      patches.resolution[None, :])
    t3 = lambda a: jnp.transpose(a, (1, 2, 0))
    wd = world.domain  # batched per-scenario domain leaves (S, 2)
    core_ops = (
        x.T,
        t3(U_warm),
        hist_op,
        n_hist[None, :],
        None if refresh_ops is not None else phik.reshape(S, K * K).T,
        *patch_ops,
        *patch_meta,
        wd.origin.T,
        wd.lengths.T,
        state.ck_sum.reshape(S, K * K).T,
    )
    if cfg.enable_safety:
        # ONE pallas program: descent step + validation + DWA; the safety
        # window is the central crop of the in-kernel patch (center_crop
        # clamps to the patch size, matching PatchField.center_crop)
        sps = safety_params_from_config(cfg, min(cfg.safety_patch_cells, sp.P))
        Unew_t, met, bc, cko, code_t, udwa_t, feas_t = fused_solve_safety(
            sp, sps, *core_ops, vb.T, tile=cfg.solve_tile,
            refresh_ops=refresh_ops)
        U_new = jnp.transpose(Unew_t, (2, 0, 1))  # (S, H, nu)
        u0 = U_new[:, 0]
        code = code_t[0]
        u_dwa = udwa_t.T
        feasible = feas_t[0].astype(bool)
        use_dwa = code >= CRASH
        u_cmd = jnp.where(use_dwa[:, None], u_dwa, u0)
    else:
        Unew_t, met, bc, cko = fused_solve(sp, *core_ops, tile=cfg.solve_tile,
                                           refresh_ops=refresh_ops)
        U_new = jnp.transpose(Unew_t, (2, 0, 1))
        u0 = U_new[:, 0]
        code = jnp.zeros((S,), dtype=jnp.int32)
        feasible = jnp.ones((S,), dtype=bool)
        use_dwa = jnp.zeros((S,), dtype=bool)
        u_cmd = u0

    # ---- divergence guard (per scenario, branch-free) ----
    diverged = ~(
        jnp.all(jnp.isfinite(U_new), axis=(1, 2)) & jnp.all(jnp.isfinite(u_cmd), axis=1)
    )
    U_new = jnp.where(diverged[:, None, None], 0.0, U_new)
    u_cmd = jnp.where(diverged[:, None], 0.0, u_cmd)

    # ---- warm-start shift + history append (ck_sum updated in-kernel) ----
    U_next = jnp.concatenate(
        [U_new[:, 1:], jnp.zeros((S, 1, cfg.nu), dtype=U_new.dtype)], axis=1
    )
    new_buffer = jax.vmap(lambda b, p: b.append(p))(state.buffer, x[:, :2])
    ck_sum = cko.T.reshape(S, K, K)

    new_state = ControllerState(
        U=U_next,
        buffer=new_buffer,
        ck_sum=ck_sum,
        hist_count=state.hist_count + 1,
        rng=rng,
    )
    diag = StepDiagnostics(
        ergodic_metric=met[0],
        barrier_cost=bc[0],
        collision_code=code,
        dwa_active=use_dwa,
        dwa_feasible=feasible,
        diverged=diverged,
        orbit_reset=orbiting,
    )
    return new_state, u_cmd, diag


# ---------------------------------------------------------------------------
# fused safety kernel: emitted-control validation + DWA fallback
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SafetyParams:
    """Static parameters for the fused validation+DWA kernel."""

    nu: int
    Pc: int  # cropped patch cells
    b_radius: float
    d_safe: float
    val_dt: float
    val_horizon: int
    dwa_dt: float
    dwa_horizon: int
    samples: Tuple[int, int, int]
    acc_lim: Tuple[float, float, float]
    vel_lim: Tuple[float, float, float]
    mx: Tuple[float, ...]
    my: Tuple[float, ...]
    mw: Tuple[float, ...]
    finv: Tuple[Tuple[float, float, float], ...]  # (nu, 3): u = finv @ twist
    cost_space: str = "control"  # "control" (reference A.6) | "twist"


def _model_finv(model):
    """Static body-twist -> wheel-velocity rows (models' from_twist)."""
    from ergodic_exploration_tpu.models.cart import Cart
    from ergodic_exploration_tpu.models.omni import Omni

    if isinstance(model, Cart):
        r, b = model.wheel_radius, model.wheel_base
        return ((1.0 / r, 0.0, -0.5 * b / r), (1.0 / r, 0.0, 0.5 * b / r))
    if isinstance(model, Omni):
        r = model.wheel_radius
        L = model.lx + model.ly
        return (
            (1.0 / r, -1.0 / r, -L / r),
            (1.0 / r, 1.0 / r, L / r),
            (1.0 / r, 1.0 / r, -L / r),
            (1.0 / r, -1.0 / r, L / r),
        )
    raise TypeError(f"fused safety supports cart/omni, got {type(model)!r}")


def safety_params_from_config(cfg, crop_cells: int) -> SafetyParams:
    from ergodic_exploration_tpu.models import make_model

    model = make_model(cfg)
    mx, my, mw = model_rows(model)
    return SafetyParams(
        nu=cfg.nu, Pc=crop_cells, b_radius=cfg.boundary_radius,
        d_safe=cfg.d_safe, val_dt=cfg.val_dt, val_horizon=cfg.val_horizon,
        dwa_dt=cfg.dwa.dt, dwa_horizon=cfg.dwa.horizon,
        samples=tuple(cfg.dwa.samples), acc_lim=tuple(cfg.dwa.acc_lim),
        vel_lim=tuple(cfg.dwa.vel_lim), mx=mx, my=my, mw=mw,
        finv=_model_finv(model), cost_space=cfg.dwa.cost_space,
    )


_INFEASIBLE = 1.0e9  # keep in sync with ops/dwa.py


class _SafetyGeom:
    """Shared closures for the validation + DWA stages (one namespace so the
    merged kernel can run validation ALWAYS but the sweep lazily)."""

    __slots__ = ("twist", "arc", "step_window", "pose_code", "dwa_crash",
                 "T", "x0", "y0", "th0", "do_r", "dl_r")


def _safety_geom(sp: SafetyParams, x_r, pd_c, psx, psy, po_r, pr_r, do_r, dl_r):
    """Geometry/query closures over the (Pc, Pc, T) clearance window ``pd_c``
    with start (psx, psy)."""
    Pc = sp.Pc
    nu = sp.nu
    T = x_r.shape[-1]
    x0, y0, th0 = x_r[0, :], x_r[1, :], x_r[2, :]
    c0, s0 = jnp.cos(th0), jnp.sin(th0)
    res = pr_r[0, :]
    Lx, Ly = dl_r[0, :], dl_r[1, :]

    def twist(u):  # u: tuple/list of nu (..., T) arrays
        vx = sum(sp.mx[i] * u[i] for i in range(nu))
        vy = sum(sp.my[i] * u[i] for i in range(nu))
        w = sum(sp.mw[i] * u[i] for i in range(nu))
        return vx, vy, w

    def arc(vx, vy, w, t):
        """Exact constant-twist pose at time t (integrator.py
        constant_twist_poses semantics, incl. the small-w series)."""
        wt = w * t
        s, c = jnp.sin(wt), jnp.cos(wt)
        small = jnp.abs(w) < 1e-6
        w_safe = jnp.where(small, 1.0, w)
        a = jnp.where(small, t * (1.0 - wt * wt / 6.0), s / w_safe)
        b = jnp.where(small, w * t * t * 0.5, (1.0 - c) / w_safe)
        dxb = vx * a - vy * b
        dyb = vx * b + vy * a
        return x0 + c0 * dxb - s0 * dyb, y0 + s0 * dxb + c0 * dyb

    def step_window(t, steps):
        """Static (offset, width) of the reach-limited sub-window at step t.

        The queried pose has moved at most (t/steps) of the final reach,
        which the Pc window covers BY THE CONFIG CONTRACT (safety window >=
        reach + margin, config.safety_patch_cells); scaling its half-width
        linearly with one extra cell of rounding margin keeps every real
        query strictly inside the sub-window, so the nearest-cell result is
        IDENTICAL — but the one-hot select work shrinks ~(W_t/Pc)^2 on the
        early steps (round-3 kernel profile: the DWA sweep was ~1.3 ms)."""
        half = min(Pc // 2, int(np.ceil((Pc // 2) * t / steps)) + 1)
        Wt = min(Pc, 2 * half + 1)
        return (Pc - Wt) // 2, Wt

    # ---- bit-packed threshold planes (round 4) ----
    # The validator and the DWA sweep consume only THRESHOLDED clearances
    # (crash: d <= 0; warn: d < d_safe), so each crop ROW packs into one
    # f32-exact integer (sum of distinct 2^b, exact for Pc <= 24; Pc = 16
    # at defaults) and a pose query becomes a one-hot row-select (Wt FMA)
    # plus an exact power-of-two bit extract — instead of the (Wt, Wt)
    # one-hot double contraction (~Wt^2 FMA). The thresholds are applied
    # to the FULL-precision pd with the exact original expressions, and
    # f32 comparison signs are rounding-stable, so collision codes are
    # BIT-IDENTICAL to the dense path (pinned by tests). Scalar 2^b
    # weights keep Pallas happy (no captured array constants).
    use_bits = Pc <= 24
    if use_bits:
        d_full = pd_c - sp.b_radius  # (Pc, Pc, T)
        crash_pl = (d_full <= 0.0).astype(jnp.float32)
        warn_pl = (d_full < sp.d_safe).astype(jnp.float32)
        cbits = sum(crash_pl[:, b, :] * float(2 ** b) for b in range(Pc))
        wbits = sum(warn_pl[:, b, :] * float(2 ** b) for b in range(Pc))

    def _extract_bit(rowbits, ipw):
        """bit ax of the packed row: floor(bits * 2^-ax) mod 2 — exact
        (integer < 2^Pc times an exact power of two)."""
        t = jnp.floor(rowbits * ipw)
        return (t - 2.0 * jnp.floor(t * 0.5)) > 0.5

    def pose_code(px, py, o, Wt):
        """Collision code at a position (ops/collision.py check_pose via
        the cropped window's nearest-cell query)."""
        cells_t = jax.lax.broadcasted_iota(jnp.int32, (Wt, 1), 0).astype(jnp.float32)
        fx = (px - po_r[0, :]) / res - 0.5 - (psx + float(o))
        fy = (py - po_r[1, :]) / res - 0.5 - (psy + float(o))
        ox = (jnp.round(jnp.clip(fx, 0.0, Wt - 1.001))[None, :]
              == cells_t).astype(jnp.float32)  # (Wt, T)
        oy = (jnp.round(jnp.clip(fy, 0.0, Wt - 1.001))[None, :]
              == cells_t).astype(jnp.float32)
        relx = px - do_r[0, :]
        rely = py - do_r[1, :]
        inside = (relx >= 0.0) & (relx <= Lx) & (rely >= 0.0) & (rely <= Ly)
        if use_bits:
            rowc = sum(oy[a] * cbits[o + a] for a in range(Wt))  # (T,)
            roww = sum(oy[a] * wbits[o + a] for a in range(Wt))
            ipw = sum(ox[b] * float(2.0 ** -(o + b)) for b in range(Wt))
            crash = (~inside) | _extract_bit(rowc, ipw)
            warn = _extract_bit(roww, ipw)
        else:
            pd_t = pd_c[o:o + Wt, o:o + Wt, :]
            row = jnp.sum(pd_t * ox[None, :, :], axis=1)
            d = jnp.sum(oy * row, axis=0) - sp.b_radius  # (T,)
            crash = (~inside) | (d <= 0.0)
            warn = d < sp.d_safe
        return jnp.where(crash, 2, jnp.where(warn, 1, 0)).astype(jnp.int32)

    def dwa_crash(px, py, o, Wt, C):
        """Crash test (d <= 0 at the nearest cell) for (C, T) candidate
        poses; domain containment is checked by the caller."""
        cells_t = jax.lax.broadcasted_iota(jnp.int32, (Wt, 1), 0).astype(jnp.float32)
        fx = (px - po_r[0, :][None, :]) / res[None, :] - 0.5 - (psx + float(o))[None, :]
        fy = (py - po_r[1, :][None, :]) / res[None, :] - 0.5 - (psy + float(o))[None, :]
        ox = (jnp.round(jnp.clip(fx, 0.0, Wt - 1.001))[:, None, :]
              == cells_t[None, :, :]).astype(jnp.float32)  # (C, Wt, T)
        oy = (jnp.round(jnp.clip(fy, 0.0, Wt - 1.001))[:, None, :]
              == cells_t[None, :, :]).astype(jnp.float32)
        if use_bits:
            rowc = sum(oy[:, a, :] * cbits[o + a][None, :] for a in range(Wt))
            ipw = sum(ox[:, b, :] * float(2.0 ** -(o + b)) for b in range(Wt))
            return _extract_bit(rowc, ipw)  # (C, T) bool
        clearance = jnp.zeros((C, T), jnp.float32)
        for a in range(Wt):  # clearance = sum_a oy[a] * (pd[a] @ ox)
            row = jnp.sum(pd_c[o + a, o:o + Wt, :][None, :, :] * ox, axis=1)
            clearance = clearance + oy[:, a, :] * row
        return clearance - sp.b_radius <= 0.0

    G = _SafetyGeom()
    G.twist, G.arc, G.step_window, G.pose_code = twist, arc, step_window, pose_code
    G.T, G.x0, G.y0, G.th0, G.do_r, G.dl_r = T, x0, y0, th0, do_r, dl_r
    G.dwa_crash = dwa_crash
    return G


def _validate_u0(sp: SafetyParams, G, u0):
    """Validation of u0 (collision.validate_control). Returns (code (T,)
    i32, (vx0, vy0, w0) — u0's twist, reused by the sweep's cost)."""
    vx0, vy0, w0 = G.twist(u0)
    code = jnp.zeros((G.T,), jnp.int32)
    for t in range(1, sp.val_horizon + 1):
        px, py = G.arc(vx0, vy0, w0, sp.val_dt * t)
        o, Wt = G.step_window(t, sp.val_horizon)
        code = jnp.maximum(code, G.pose_code(px, py, o, Wt))
    return code, (vx0, vy0, w0)


def _dwa_sweep(sp: SafetyParams, G, vb_r, u0, tw0):
    """DWA candidate sweep (ops/dwa.py), VECTORIZED over the C candidates
    (leading axis) so only steps and patch rows unroll."""
    nu = sp.nu
    nvx, nvy, nw = sp.samples
    C = nvx * nvy * nw
    T = G.T
    vx0, vy0, w0 = tw0
    Lx, Ly = G.dl_r[0, :], G.dl_r[1, :]
    do_r = G.do_r

    def axis_samples(center, acc, vmax, n):
        if n == 1:
            return [jnp.zeros((T,), jnp.float32)]
        lo = jnp.clip(center - acc * sp.dwa_dt, -vmax, vmax)
        hi = jnp.clip(center + acc * sp.dwa_dt, -vmax, vmax)
        return [lo + (hi - lo) * (i / (n - 1)) for i in range(n)]

    vxs = axis_samples(vb_r[0, :], sp.acc_lim[0], sp.vel_lim[0], nvx)
    vys = axis_samples(vb_r[1, :], sp.acc_lim[1], sp.vel_lim[1], nvy)
    ws = axis_samples(vb_r[2, :], sp.acc_lim[2], sp.vel_lim[2], nw)
    # meshgrid(indexing="ij") flatten order: vx outer, vy mid, omega inner
    cvx = jnp.stack([vx for vx in vxs for _ in vys for _ in ws])  # (C, T)
    cvy = jnp.stack([vy for _ in vxs for vy in vys for _ in ws])
    cw = jnp.stack([w for _ in vxs for _ in vys for w in ws])
    u_c = [
        sp.finv[i][0] * cvx + sp.finv[i][1] * cvy + sp.finv[i][2] * cw
        for i in range(nu)
    ]  # nu x (C, T)
    rvx, rvy, rw = G.twist(u_c)  # realized twists (C, T)

    crash = jnp.zeros((C, T), jnp.bool_)
    for t in range(1, sp.dwa_horizon + 1):
        o, Wt = G.step_window(t, sp.dwa_horizon)  # reach-limited sub-window
        px, py = G.arc(rvx, rvy, rw, sp.dwa_dt * t)  # (C, T)
        hit = G.dwa_crash(px, py, o, Wt, C)
        inside = ((px >= do_r[0, :][None, :]) & (px <= (do_r[0, :] + Lx)[None, :])
                  & (py >= do_r[1, :][None, :]) & (py <= (do_r[1, :] + Ly)[None, :]))
        crash = crash | (~inside) | hit

    if sp.cost_space == "control":
        # reference cost (SURVEY.md A.6): ||u_cand - u0||^2 in wheel space
        cost = jnp.zeros_like(rvx)
        for i in range(nu):
            du = u_c[i] - u0[i][None, :]
            cost = cost + du * du
    else:  # "twist"
        cost = ((rvx - vx0[None, :]) ** 2 + (rvy - vy0[None, :]) ** 2
                + (rw - w0[None, :]) ** 2)
    cost = jnp.where(crash, _INFEASIBLE, cost)  # (C, T)
    best_cost = jnp.min(cost, axis=0)  # (T,)
    # first-argmin pick (jnp.argmin parity): earliest candidate achieving
    # the min, selected with a one-hot built from a running prefix mask
    is_min = cost == best_cost[None, :]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0).astype(jnp.float32)
    first = jnp.min(jnp.where(is_min, cidx, float(C)), axis=0)  # (T,)
    onehot = (cidx == first[None, :]).astype(jnp.float32)  # (C, T)
    feasible = best_cost < _INFEASIBLE
    udwa = [
        jnp.where(feasible, jnp.sum(onehot * u_c[i], axis=0), 0.0)
        for i in range(nu)
    ]
    return udwa, feasible


def _safety_ops(sp: SafetyParams, x_r, vb_r, u0, pd_c, psx, psy,
                po_r, pr_r, do_r, dl_r):
    """Validation + DWA math on (..., T) tiles — the standalone safety
    kernel's (unconditional) composition of :func:`_validate_u0` and
    :func:`_dwa_sweep`. Returns (code (T,) i32, udwa list, feas)."""
    G = _safety_geom(sp, x_r, pd_c, psx, psy, po_r, pr_r, do_r, dl_r)
    code, tw0 = _validate_u0(sp, G, u0)
    udwa, feasible = _dwa_sweep(sp, G, vb_r, u0, tw0)
    return code, udwa, feasible


def _make_safety_kernel(sp: SafetyParams):
    nu, Pc = sp.nu, sp.Pc
    nvx, nvy, nw = sp.samples
    C = nvx * nvy * nw

    def kernel(x_r, vb_r, u0_r, pd_r, ps_r, po_r, pr_r, do_r, dl_r,
               code_r, udwa_r, feas_r):
        u0 = [u0_r[i, :] for i in range(nu)]
        code, udwa, feasible = _safety_ops(
            sp, x_r, vb_r, u0, pd_r[:, :, :], ps_r[0, :], ps_r[1, :],
            po_r, pr_r, do_r, dl_r)
        code_r[0, :] = code
        feas_r[0, :] = feasible.astype(jnp.int32)
        for i in range(nu):
            udwa_r[i, :] = udwa[i]

    return kernel, C

def fused_safety(sp: SafetyParams, x, vb, u0, pd, pstart, porigin, pres,
                 dorigin, dlen, tile: int = 128, interpret=None):
    """Fused validation + DWA. Transposed operands: x/vb (3,S), u0 (nu,S),
    pd (Pc,Pc,S) cropped clearance window, pstart/porigin/dorigin/dlen (2,S),
    pres (1,S). Returns (code (1,S) i32, u_dwa (nu,S), feasible (1,S) i32)."""
    S = x.shape[-1]
    while S % tile != 0:
        tile //= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel, _ = _make_safety_kernel(sp)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(dims + (tile,),
                            (lambda i, _nd=nd: (0,) * _nd + (i,)),
                            memory_space=pltpu.VMEM)

    Pc, nu = sp.Pc, sp.nu
    return pl.pallas_call(
        kernel,
        grid=(S // tile,),
        in_specs=[spec(3), spec(3), spec(nu), spec(Pc, Pc),
                  spec(2), spec(2), spec(1), spec(2), spec(2)],
        out_specs=(spec(1), spec(nu), spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((1, S), jnp.int32),
            jax.ShapeDtypeStruct((nu, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, vb, u0, pd, pstart, porigin, pres, dorigin, dlen)

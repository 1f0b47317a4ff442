"""Range-sensor map update: reveal cells around the robot, on-device.

Reference context: the reference node receives its occupancy grid from an
external SLAM stack over ``/map`` (SURVEY.md sections 2 L5, 4.3) — mapping
itself is outside the package. The batched engine has no ROS/SLAM in the
loop, so closed-loop mutual-information exploration (BASELINE config 4)
needs a minimal on-device mapping model: each tick, cells within sensor
range of the robot are revealed from a hidden ground-truth map (unknown ->
free/occupied), and the entropy target is recomputed from the evolving
belief.

TPU-first: the reveal is a pure elementwise update over the (H, W) belief —
a distance mask against the pose, no gathers/scatters — so thousands of
per-scenario maps update in one fused op under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ergodic_exploration_tpu.grid import GridMap, UNKNOWN

_EXACT = jax.lax.Precision.HIGHEST


def reveal(belief: GridMap, truth: GridMap, pose, sensor_range: float) -> GridMap:
    """Reveal ground truth within ``sensor_range`` of ``pose`` (disc model).

    Args:
        belief: current believed map (-1 unknown / prob).
        truth: ground-truth map (same geometry).
        pose: (3,) or (2,) robot position.
        sensor_range: reveal radius in meters.

    Returns:
        updated belief GridMap. Already-known cells keep their value (the
        truth is static, so re-revealing is idempotent).
    """
    h, w = belief.shape
    res = belief.resolution
    cx = belief.origin[0] + (jnp.arange(w, dtype=jnp.float32) + 0.5) * res  # (W,)
    cy = belief.origin[1] + (jnp.arange(h, dtype=jnp.float32) + 0.5) * res  # (H,)
    d2 = (cx[None, :] - pose[0]) ** 2 + (cy[:, None] - pose[1]) ** 2  # (H, W)
    seen = d2 <= sensor_range * sensor_range
    data = jnp.where(seen, truth.data, belief.data)
    return belief._replace(data=data)


def reveal_raycast(belief: GridMap, truth: GridMap, pose, sensor_range: float,
                   window_cells: int, n_bins: int = 256,
                   occupied_threshold: float = 0.65) -> GridMap:
    """Occlusion-aware reveal: cells behind walls stay unknown (VERDICT r2
    item 7; reference semantics — its ``/map`` comes from a SLAM stack whose
    range sensor cannot see through obstacles, SURVEY.md section 4.3).

    TPU-first, zero gathers/scatters: a polar **visibility transform** on a
    local window around the pose —

    1. window extraction as one-hot row/column matmuls (the ops/patch.py
       pattern);
    2. each window cell is binned by its polar angle about the sensor and
       its radius step; an OCCUPIED cell blocks every angle bin inside the
       angular interval the cell subtends (half-width atan(0.55 / r_cells)
       — center-only binning would leak rays between adjacent wall cells);
       ``blocked[b, q] = any occupied cell covering bin b at radius step
       q`` is ONE (N, n_bins)^T @ (N, n_r) matmul;
    3. shadowing is a cumulative-OR along the radius axis (cells strictly
       behind the first blocker in their bin are invisible; the blocker
       itself is visible);
    4. per-cell visibility is the one-hot contraction B_ang @ V ⊙ B_rad;
    5. the updated window blends back into the full map through the
       transposed one-hot selectors (no scatter; reveal is monotone).

    Args:
        window_cells: STATIC window side length; must cover the sensor disc
            (>= 2 * ceil(sensor_range / resolution) + 1). Compute it eagerly
            from the (concrete) map resolution before jitting.
        n_bins: angular resolution. Bin arcs should stay under ~1 cell at
            the window edge (n_bins >= pi * window_cells) or thin diagonal
            walls can leak single rays between bins.
        occupied_threshold: truth occupancy above which a cell blocks rays.

    Returns the updated belief GridMap (same geometry).
    """
    h, w = belief.shape
    P = min(window_cells, h, w)
    res = belief.resolution
    dtype = belief.data.dtype

    # --- 1. window extraction (one-hot selectors; edge-clamped like patch) ---
    cf = (pose[:2] - belief.origin) / res - 0.5  # fractional (ix, iy)
    start = jnp.round(cf).astype(jnp.int32) - P // 2
    ii = jnp.arange(P, dtype=jnp.int32)
    rows = jnp.clip(start[1] + ii, 0, h - 1)
    cols = jnp.clip(start[0] + ii, 0, w - 1)
    R = (rows[:, None] == jnp.arange(h, dtype=jnp.int32)).astype(dtype)  # (P, h)
    C = (cols[:, None] == jnp.arange(w, dtype=jnp.int32)).astype(dtype)  # (P, w)
    truth_w = jnp.matmul(jnp.matmul(R, truth.data, precision=_EXACT), C.T,
                         precision=_EXACT)  # (P, P) [iy, ix]

    # window cell centers relative to the sensor
    gx = belief.origin[0] + (cols.astype(dtype) + 0.5) * res  # (P,)
    gy = belief.origin[1] + (rows.astype(dtype) + 0.5) * res
    dx = gx[None, :] - pose[0]  # (P, P) [iy, ix]
    dy = gy[:, None] - pose[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)  # [-pi, pi]

    # --- 2. polar binning (one-hots; builders fuse into the matmuls) ---
    n_r = P // 2 + 2  # radius steps of one cell each
    bin_f = jnp.clip(jnp.floor((ang + jnp.pi) / (2.0 * jnp.pi) * n_bins), 0, n_bins - 1)
    q_f = jnp.clip(jnp.round(r / res), 0, n_r - 1)
    Ba = (bin_f.reshape(-1, 1) == jnp.arange(n_bins, dtype=dtype)).astype(dtype)  # (N, n_bins)
    Br = (q_f.reshape(-1, 1) == jnp.arange(n_r, dtype=dtype)).astype(dtype)  # (N, n_r)
    occ = (truth_w >= occupied_threshold).astype(dtype).reshape(-1, 1)  # (N, 1)
    # blocker membership: the angular INTERVAL the cell subtends (wrapped)
    r_cells = jnp.maximum(r / res, 0.5).reshape(-1, 1)
    half_w = jnp.arctan(0.55 / r_cells)  # (N, 1)
    bin_centers = ((jnp.arange(n_bins, dtype=dtype) + 0.5) / n_bins) * (2.0 * jnp.pi) - jnp.pi
    dang = ang.reshape(-1, 1) - bin_centers[None, :]
    dang = jnp.abs(jnp.mod(dang + jnp.pi, 2.0 * jnp.pi) - jnp.pi)  # (N, n_bins)
    Bw = (dang <= half_w).astype(dtype)
    blocked = jnp.matmul(Bw.T, Br * occ, precision=_EXACT)  # (n_bins, n_r)

    # --- 3. shadow: invisible once strictly past the first blocker ---
    shadow = jnp.cumsum(blocked, axis=1) - blocked  # blockers at steps < q
    V = (shadow < 0.5).astype(dtype)  # (n_bins, n_r) visible

    # --- 4. per-cell visibility + range disc ---
    vis_cell = jnp.sum(jnp.matmul(Ba, V, precision=_EXACT) * Br, axis=1)  # (N,)
    vis_w = (vis_cell > 0.5) & (r.reshape(-1) <= sensor_range)
    vis_w = vis_w.reshape(P, P)

    # --- 5. blend back through the transposed selectors (no scatter).
    # Edge-clamped duplicate rows/cols make R^T/C^T counts > 1 on the map
    # border; visibility is monotone, so "any window copy sees it" is right:
    vis_full = jnp.matmul(jnp.matmul(R.T, vis_w.astype(dtype), precision=_EXACT),
                          C, precision=_EXACT) > 0.5  # (h, w)
    data = jnp.where(vis_full, truth.data, belief.data)
    return belief._replace(data=data)


def raycast_window_cells(sensor_range: float, resolution: float) -> int:
    """STATIC window size covering the sensor disc (+1 cell of rounding)."""
    import math

    return 2 * (int(math.ceil(sensor_range / resolution)) + 1) + 1


def fraction_known(belief: GridMap):
    """Scalar in [0, 1]: how much of the map has been observed."""
    return jnp.mean((belief.data != UNKNOWN).astype(jnp.float32))

"""Map / trajectory / target rendering — the RViz replacement.

Reference capability: the node's visualization publishers — predicted path
(``nav_msgs/Path``), target GMM markers, sampled-point clouds rendered in
RViz (SURVEY.md sections 2 L5 and 6, observability row). Build-side: pure
matplotlib renders of the same artifacts, batched-aware (pick a scenario).

matplotlib is imported lazily so headless/bench jobs never pay for it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def render_scenario(
    ax,
    domain,
    grid=None,
    phi=None,
    phi_shape=None,
    trajectory=None,
    predicted=None,
    gmm=None,
    title: Optional[str] = None,
):
    """Draw one scenario's world + trajectory on a matplotlib axes.

    Args:
        ax: matplotlib axes.
        domain: Domain (unbatched).
        grid: optional GridMap (unbatched) — drawn as an occupancy image.
        phi: optional (Ns,) target sample values (drawn as a heatmap).
        phi_shape: (nsx, nsy) lattice shape for ``phi``.
        trajectory: optional (T, 3) executed states (drawn as a line).
        predicted: optional (H+1, 3) predicted path (dashed).
        gmm: optional GaussianMixture — component means drawn as markers.
    """
    o = np.asarray(domain.origin)
    L = np.asarray(domain.lengths)
    extent = [o[0], o[0] + L[0], o[1], o[1] + L[1]]

    if phi is not None and phi_shape is not None:
        img = np.asarray(phi).reshape(phi_shape)  # [ix, iy]
        ax.imshow(img.T, origin="lower", extent=extent, cmap="viridis", alpha=0.8)
    if grid is not None:
        occ = np.ma.masked_less(np.asarray(grid.data), 0.65)
        g0 = np.asarray(grid.origin)
        h, w = grid.shape
        res = float(np.asarray(grid.resolution))
        gext = [g0[0], g0[0] + w * res, g0[1], g0[1] + h * res]
        ax.imshow(occ, origin="lower", extent=gext, cmap="gray_r", vmin=0, vmax=1)
    if trajectory is not None:
        T = np.asarray(trajectory)
        ax.plot(T[:, 0], T[:, 1], "w-", lw=1.5, label="executed")
        ax.plot(T[-1, 0], T[-1, 1], "wo", ms=5)
    if predicted is not None:
        P = np.asarray(predicted)
        ax.plot(P[:, 0], P[:, 1], "r--", lw=1.0, label="predicted")
    if gmm is not None:
        M = np.asarray(gmm.means)
        ax.plot(M[:, 0], M[:, 1], "r*", ms=12, label="target modes")
    ax.set_xlim(extent[0], extent[1])
    ax.set_ylim(extent[2], extent[3])
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)


def save_exploration_figure(
    path: str,
    domain,
    out,
    scenario: int = 0,
    grid=None,
    phi=None,
    phi_shape=None,
    gmm=None,
):
    """Render one scenario of an :class:`ExploreOutput` to an image file,
    plus the ergodic-metric curve."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))
    traj = np.asarray(out.trajectory[:, scenario])
    render_scenario(
        ax1, domain, grid=grid, phi=phi, phi_shape=phi_shape,
        trajectory=traj, gmm=gmm, title=f"scenario {scenario}",
    )
    em = np.asarray(out.diag.ergodic_metric[:, scenario])
    ax2.plot(em)
    ax2.set_xlabel("tick")
    ax2.set_ylabel("ergodic metric")
    ax2.set_title("ergodic metric")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path

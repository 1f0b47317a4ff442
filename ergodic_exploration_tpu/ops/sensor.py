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

import jax.numpy as jnp

from ergodic_exploration_tpu.grid import GridMap, UNKNOWN


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


def fraction_known(belief: GridMap):
    """Scalar in [0, 1]: how much of the map has been observed."""
    return jnp.mean((belief.data != UNKNOWN).astype(jnp.float32))

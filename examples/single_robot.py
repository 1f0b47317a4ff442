"""Single-robot exploration demo — the reference's cart launch, ROS-free.

Simulates a robot exploring a walled 5x5 m world with a mutual-information
target: the "SLAM map" is revealed by a disc sensor around the robot, the
node replans at 10 Hz, and the run renders to single_robot.png.

    python examples/single_robot.py [--model cart|omni] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cart", choices=["cart", "omni"])
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.grid import GridMap
    from ergodic_exploration_tpu.node import ExplorationNode
    from ergodic_exploration_tpu.ops.integrator import constant_twist_poses
    from ergodic_exploration_tpu.ops.sensor import reveal
    from ergodic_exploration_tpu.utils.metrics import MetricsLogger

    # ground truth: 5x5 m, a wall with a gap + a pillar
    truth_np = np.zeros((100, 100), dtype=np.float32)
    truth_np[48:52, 10:60] = 1.0
    truth_np[48:52, 75:95] = 1.0
    truth_np[20:28, 70:78] = 1.0
    truth = GridMap.create(truth_np, 0.0, 0.0, 0.05)
    belief = truth._replace(data=jnp.full_like(truth.data, -1.0))

    cfg = default_config(args.model).replace(ergodic_weight=50.0)
    node = ExplorationNode(cfg, target="mi")
    pose = jnp.array([1.0, 1.0, 0.3])
    node.on_odom(pose)
    log = MetricsLogger()
    traj = [np.asarray(pose)]

    reveal_j = jax.jit(reveal, static_argnums=())
    for t in range(args.steps):
        if t % 10 == 0:  # ~1 Hz map updates against the 10 Hz control loop
            belief = reveal_j(belief, truth, node._pose, 1.2)
            node.on_map(np.asarray(belief.data), 0.0, 0.0, 0.05)
        tw, diag = node.step()
        X = constant_twist_poses(node._pose, jnp.asarray(tw), jnp.array([cfg.dt]))
        node.on_odom(X[0], tw)
        traj.append(np.asarray(X[0]))
        if t % 50 == 0:
            rec = log.log(jax.tree.map(lambda a: np.asarray(a)[None], diag))
            known = float(np.mean(np.asarray(belief.data) >= 0))
            print(f"t={t:4d} pose=({traj[-1][0]:.2f},{traj[-1][1]:.2f}) "
                  f"E={rec['ergodic_metric_mean']:.4f} map_known={known:.0%} "
                  f"dwa={rec['dwa_fallback_rate']:.0%}")

    # render
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ergodic_exploration_tpu.viz import render_scenario

    fig, ax = plt.subplots(figsize=(6, 6))
    render_scenario(ax, node.domain, grid=belief, trajectory=np.stack(traj),
                    predicted=node.predicted_path(), title="MI exploration")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "single_robot.png")
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Measure the single-robot 10 Hz loop ON TPU: node.run() with a simulated
plant and periodic live map updates, fused and unfused (VERDICT r1 item 6;
reference: the exploration node's frequency-Hz control loop, SURVEY.md 4.2).

Per-tick latency here is honest wall time of node.step() as the host loop
experiences it — it includes the host->device argument transfer and the
device->host twist readback each tick (the real-time loop cannot chain), so
the ~30 ms tunnel round trip of this attachment is part of every sample.
On-robot deployments talk to a local TPU/CPU without that tunnel.

Run: python tools/tpu_node_loop.py  (claims the TPU; never run concurrently
with bench/tests).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_loop(fused: bool, n_steps: int = 300, map_every: int = 50,
             pipeline: bool = False):
    import jax
    import jax.numpy as jnp

    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.node import ExplorationNode
    from ergodic_exploration_tpu.ops import target
    from ergodic_exploration_tpu.ops.integrator import rollout

    cfg = default_config("cart").replace(use_fused_solve=fused)
    gmm = target.GaussianMixture.create(
        means=np.array([[1.2, 3.8], [3.8, 3.8]], np.float32),
        covs=np.tile(0.15 * np.eye(2, dtype=np.float32)[None], (2, 1, 1)),
    )
    node = ExplorationNode(cfg, target=gmm, use_native=True, pipeline=pipeline)

    H = W = 100
    base = np.zeros((H, W), np.int8)
    base[45:50, 20:80] = 100
    node.on_map(base, resolution=0.05)
    node.on_odom([2.5, 0.8, 1.2])

    model = node.model
    pose = jnp.asarray([2.5, 0.8, 1.2])

    # simulated plant: apply the commanded twist through the true kinematics
    state = {"pose": pose}

    def plant(tw):
        u = model.from_twist(jnp.asarray(tw))
        state["pose"] = rollout(model, state["pose"], u[None, :], cfg.dt)[-1]
        return np.asarray(state["pose"]), np.asarray(tw)

    # warm-up/compile outside the measurement
    node.step()
    lat, dwa = [], 0
    t_wall0 = time.perf_counter()
    for i in range(n_steps):
        if i > 0 and i % map_every == 0:
            # live map update: new obstacle appears (reference mapCallback
            # cadence ~1 Hz against the 10 Hz control loop)
            m = base.copy()
            m[70 : 74 + (i // map_every) * 2, 55:65] = 100
            node.on_map(m, resolution=0.05)  # next step pays EDT+target refresh
        t0 = time.perf_counter()
        tw, diag = node.step()
        lat.append(time.perf_counter() - t0)
        dwa += int(np.asarray(diag.dwa_active)) if diag is not None else 0
        plant_out = plant(tw)
        node.on_odom(*plant_out)
    wall = time.perf_counter() - t_wall0
    lat = np.asarray(lat) * 1e3
    return {
        "fused": fused,
        "pipeline": pipeline,
        "n_steps": n_steps,
        "map_updates": n_steps // map_every,
        "p50_ms": round(float(np.median(lat)), 3),
        "p90_ms": round(float(np.percentile(lat, 90)), 3),
        "p99_ms": round(float(np.percentile(lat, 99)), 3),
        "max_ms": round(float(lat.max()), 3),
        "budget_ms": 100.0,
        # rate sustainable by node.step() alone (the plant in this harness
        # is eager host-side JAX and not part of the controller)
        "achievable_hz": round(1e3 / float(np.median(lat)), 1),
        "wall_s_incl_plant": round(wall, 1),
        "dwa_rate": round(dwa / n_steps, 3),
        "final_pose": [round(float(v), 3) for v in np.asarray(state["pose"])],
    }


def main():
    import jax

    print("device:", jax.devices()[0].platform)
    for fused, pipeline in ((False, False), (True, False), (True, True)):
        print(json.dumps(run_loop(fused, pipeline=pipeline)))


if __name__ == "__main__":
    main()

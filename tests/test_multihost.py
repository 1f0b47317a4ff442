"""REAL multi-process (multi-host analog) test: 2 jax.distributed CPU
processes, per-host scenario feeding, sharded explore == single-process
explore, collective checkpoint save/load (VERDICT r1 item 1; SURVEY.md
section 3 "multi-host launcher" and section 5 item 3).

The parent pytest process never initializes jax.distributed itself — it
spawns two fresh workers (tests/multihost_worker.py) wired to a localhost
coordinator, then replays the identical scenario single-process and compares
trajectories.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_explore_matches_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    got = np.load(tmp_path / "multihost_traj.npz")

    # ---- identical scenario, single process (this pytest process) ----
    import jax
    import jax.numpy as jnp

    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.grid import Domain, GridMap
    from ergodic_exploration_tpu.ops import target

    cfg = default_config("cart").replace(
        num_basis=5, horizon=6, buffer_capacity=16, grid_samples=(16, 16),
    )
    engine = Engine(cfg)
    S = 8
    DOM = Domain.create(0.0, 0.0, 2.0, 2.0)
    rng = np.random.default_rng(0)
    x0 = np.concatenate(
        [rng.uniform(0.3, 1.7, (S, 2)), rng.uniform(-3, 3, (S, 1))], axis=1
    ).astype(np.float32)
    gmm = target.GaussianMixture.create(
        means=rng.uniform(0.4, 1.6, (S, 2, 2)).astype(np.float32),
        covs=np.tile((0.1 * np.eye(2, dtype=np.float32))[None, None], (S, 2, 1, 1)),
        weights=np.ones((S, 2), np.float32),
    )
    data = np.zeros((S, 20, 20), np.float32)
    data[:, 9:11, 4:16] = 1.0
    grids = GridMap(jnp.asarray(data), jnp.zeros((S, 2)), jnp.full((S,), 0.1))
    world = engine.prepare_world(grids)
    phik = engine.phik_from_gmm(gmm, DOM, world)
    out = engine.explore(engine.init_scenarios(x0), phik, world, 10)

    want = np.asarray(out.trajectory)
    np.testing.assert_allclose(
        got["trajectory"].reshape(want.shape), want, atol=1e-5, rtol=1e-5,
        err_msg="2-process sharded explore diverged from single-process",
    )

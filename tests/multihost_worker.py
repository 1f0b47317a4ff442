"""Worker for the 2-process jax.distributed CPU test (tests/test_multihost.py).

Each process runs this script with its process_id; together they form a
2-host SPMD job over 2x2 virtual CPU devices. The worker feeds ONLY its own
scenario slice (parallel.process_scenario_slice +
Engine.shard_scenarios_from_local — the production multi-host feeding path,
SURVEY.md section 3 "multi-host launcher"), explores, checkpoints, resumes,
and process 0 writes the gathered trajectory for the parent to compare
against a single-process run.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out_dir>
"""

import os
import sys

# the worker runs as a bare subprocess (no pytest conftest, no editable
# install guaranteed) — put the repo root on sys.path ourselves
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.grid import Domain, GridMap
    from ergodic_exploration_tpu.ops import target
    from ergodic_exploration_tpu.parallel import (
        global_scenario_mesh,
        process_scenario_slice,
    )

    cfg = default_config("cart").replace(
        num_basis=5, horizon=6, buffer_capacity=16, grid_samples=(16, 16),
    )
    mesh = global_scenario_mesh()
    engine = Engine(cfg, mesh=mesh)

    S = 8
    DOM = Domain.create(0.0, 0.0, 2.0, 2.0)
    rng = np.random.default_rng(0)  # identical on every process
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
    lo, hi = process_scenario_slice(S)

    # --- per-host feeding: this process materializes ONLY its slice ---
    sc = engine.init_scenarios(x0)  # slices internally under jax.distributed
    grids_local = GridMap(
        data=jnp.asarray(data[lo:hi]),
        origin=jnp.zeros((hi - lo, 2), jnp.float32),
        resolution=jnp.full((hi - lo,), 0.1, jnp.float32),
    )
    world = engine.shard_scenarios_from_local(engine._prepare_world_jit(grids_local))
    gmm_local = jax.tree.map(lambda a: a[lo:hi], gmm)
    # free-space-masked target, computed on this host's slice only
    mask_local = jax.vmap(lambda g: engine._free_mask_one(g, DOM))(grids_local)
    phik_local = engine._phik_from_gmm_fn(gmm_local, DOM, mask_local)
    phik = engine.shard_scenarios_from_local(phik_local)

    assert not sc.x.is_fully_addressable, "scenario state must span processes"

    out = engine.explore(sc, phik, world, 10)
    traj = multihost_utils.process_allgather(out.trajectory, tiled=True)
    # tiled=True: the full (T, S, 3) global array on every process
    traj = np.asarray(traj)

    # --- checkpoint save (collective) + resume, then keep exploring ---
    ck = f"{out_dir}/multihost_ck.npz"
    engine.save_checkpoint(ck, out.scenarios)
    multihost_utils.sync_global_devices("ck_written")
    sc2 = engine.load_checkpoint(ck)
    out_a = engine.explore(out.scenarios, phik, world, 5)
    out_b = engine.explore(sc2, phik, world, 5)
    resumed_a = np.asarray(multihost_utils.process_allgather(out_a.trajectory, tiled=True))
    resumed_b = np.asarray(multihost_utils.process_allgather(out_b.trajectory, tiled=True))
    np.testing.assert_allclose(resumed_a, resumed_b, atol=1e-6)

    if pid == 0:
        np.savez(f"{out_dir}/multihost_traj.npz", trajectory=traj,
                 resumed=resumed_a)
    multihost_utils.sync_global_devices("done")
    print(f"worker {pid}: OK")


if __name__ == "__main__":
    main()

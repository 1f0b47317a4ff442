"""Regenerate the golden control trajectories for the 5 BASELINE configs.

Run deliberately (``python tests/golden/generate.py``) after an INTENDED
numerical change; tests/test_golden.py replays the same scenarios and
asserts bitwise-close controls (SURVEY.md section 5 item 4).

Everything runs on CPU with fixed seeds so goldens are machine-stable.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))


def scenarios():
    """Yield (name, fn) pairs; each fn returns the arrays to freeze."""
    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.grid import Domain, GridMap
    from ergodic_exploration_tpu.ops import target

    DOM = Domain.create(0.0, 0.0, 5.0, 5.0)
    rng = np.random.default_rng(42)
    S = 8
    x0 = np.concatenate(
        [rng.uniform(0.5, 4.5, (S, 2)), rng.uniform(-np.pi, np.pi, (S, 1))], axis=1
    ).astype(np.float32)

    def gmm_of(n_modes):
        return target.GaussianMixture.create(
            means=rng.uniform(1.0, 4.0, (S, n_modes, 2)).astype(np.float32),
            covs=np.tile((0.3 * np.eye(2, dtype=np.float32))[None, None], (S, n_modes, 1, 1)),
            weights=np.ones((S, n_modes), np.float32),
        )

    def obstacle_grids():
        data = np.zeros((S, 100, 100), dtype=np.float32)
        data[:, 45:50, 20:80] = 1.0
        data[:, 70:78, 60:68] = 1.0
        return GridMap(
            data=jnp.asarray(data),
            origin=jnp.zeros((S, 2), jnp.float32),
            resolution=jnp.full((S,), 0.05, jnp.float32),
        )

    def cfg1():  # cart, single static Gaussian, H=20, dt=0.1, no obstacles
        eng = Engine(default_config("cart"))
        out = eng.explore(
            eng.init_scenarios(x0), eng.phik_from_gmm(gmm_of(1), DOM),
            eng.empty_world(DOM, S), 12,
        )
        return {"controls": out.controls, "trajectory": out.trajectory}

    def cfg2():  # omni, 2-component GMM, H=20
        eng = Engine(default_config("omni"))
        out = eng.explore(
            eng.init_scenarios(x0), eng.phik_from_gmm(gmm_of(2), DOM),
            eng.empty_world(DOM, S), 12,
        )
        return {"controls": out.controls, "trajectory": out.trajectory}

    def cfg3():  # cart + barrier collision avoidance vs occupancy obstacles
        eng = Engine(default_config("cart"))
        world = eng.prepare_world(obstacle_grids())
        # phi normalized over FREE space (reference target.hpp semantics)
        out = eng.explore(
            eng.init_scenarios(x0), eng.phik_from_gmm(gmm_of(1), DOM, world), world, 12
        )
        return {"controls": out.controls, "trajectory": out.trajectory}

    def cfg4():  # MI target recomputed from an evolving occupancy grid
        eng = Engine(default_config("cart"))
        data = np.full((S, 100, 100), -1.0, dtype=np.float32)
        data[:, :40, :] = 0.0
        g1 = GridMap(jnp.asarray(data), jnp.zeros((S, 2)), jnp.full((S,), 0.05))
        world = eng.prepare_world(g1)
        sc = eng.init_scenarios(x0)
        out_a = eng.explore(sc, eng.phik_from_grid(g1), world, 6)
        data2 = data.copy()
        data2[:, 40:70, :] = 0.0  # more of the map becomes known
        g2 = GridMap(jnp.asarray(data2), jnp.zeros((S, 2)), jnp.full((S,), 0.05))
        out_b = eng.explore(
            out_a.scenarios, eng.phik_from_grid(g2), eng.prepare_world(g2), 6
        )
        return {
            "controls": jnp.concatenate([out_a.controls, out_b.controls]),
            "trajectory": jnp.concatenate([out_a.trajectory, out_b.trajectory]),
        }

    def cfg5():  # batched multi-scenario: per-scenario maps AND poses
        eng = Engine(default_config("cart"))
        data = np.zeros((S, 100, 100), dtype=np.float32)
        for i in range(S):  # a different wall per scenario
            r0 = 20 + 7 * i
            data[i, r0 : r0 + 4, 10:90] = 1.0
        grids = GridMap(
            data=jnp.asarray(data),
            origin=jnp.zeros((S, 2), jnp.float32),
            resolution=jnp.full((S,), 0.05, jnp.float32),
        )
        world = eng.prepare_world(grids)
        out = eng.explore(
            eng.init_scenarios(x0), eng.phik_from_gmm(gmm_of(2), DOM, world),
            world, 12,
        )
        return {"controls": out.controls, "trajectory": out.trajectory}

    return [("config1", cfg1), ("config2", cfg2), ("config3", cfg3),
            ("config4", cfg4), ("config5", cfg5)]


def main():
    for name, fn in scenarios():
        arrays = {k: np.asarray(v) for k, v in fn().items()}
        path = os.path.join(HERE, f"{name}.npz")
        np.savez_compressed(path, **arrays)
        print(f"wrote {path}: " + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()

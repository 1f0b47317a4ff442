"""Utility-layer tests: profiling timers, viz rendering."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.utils.profiling import force_completion, time_chained


def test_time_chained_measures_dependent_steps():
    @jax.jit
    def step(x, a):
        return x @ a, jnp.sum(x)

    a = jnp.eye(64)
    x = jnp.ones((64, 64))
    dt = time_chained(step, (x, a), iters=5, carry_index=0)
    assert dt > 0.0
    assert force_completion((x, a)) == 64 * 64


def test_viz_renders_figure(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ergodic_exploration_tpu.grid import Domain, GridMap
    from ergodic_exploration_tpu.viz import render_scenario

    fig, ax = plt.subplots()
    dom = Domain.create(0, 0, 2, 2)
    g = GridMap.create(np.zeros((20, 20), np.float32), 0, 0, 0.1)
    traj = np.array([[0.2, 0.2, 0.0], [0.5, 0.6, 0.1], [1.0, 1.0, 0.2]])
    render_scenario(ax, dom, grid=g, trajectory=traj, title="t")
    out = tmp_path / "fig.png"
    fig.savefig(str(out))
    plt.close(fig)
    assert out.exists() and out.stat().st_size > 1000

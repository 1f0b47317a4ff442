"""Price each MI-kernel stage by ablation (full-tick chained timing).

The _ablate variants are NOT parity-exact — they stub a stage to measure its
cost. Results feed the round-5 "MI refresh floor" section of
docs/PERFORMANCE.md. One process, clean exit.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(S=4096, iters=50):
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())

    from bench import build_case_mi
    from ergodic_exploration_tpu.ops.mi_kernel import phik_from_grid_pallas

    engine, sc, grids, world, domain = build_case_mi(S)
    cfg = engine.config
    g0 = jax.tree.map(lambda a: a[0], grids)
    out = {}

    variants = [
        ("full", frozenset()),
        ("lin_entropy", frozenset({"lin_entropy"})),
        ("no_xblur", frozenset({"no_xblur"})),
        ("no_yblur", frozenset({"no_yblur"})),
        ("no_fc", frozenset({"no_fc"})),
        ("dot1", frozenset({"dot1"})),
        ("no_tail", frozenset({"no_tail"})),
        ("no_contract", frozenset({"no_contract"})),
        ("all_off", frozenset({"lin_entropy", "no_xblur", "no_yblur",
                               "no_fc", "no_contract"})),
    ]
    for name, ab in variants:
        def both(s, g, w, _ab=ab):
            ck = phik_from_grid_pallas(
                g.data, g0, domain, cfg.num_basis, cfg.grid_samples, 3,
                frontier_cells=3, _ablate=_ab)
            s2, u, d = engine._replan_fn(s, ck, w)
            return s2, u

        f = jax.jit(both, donate_argnums=(0,))
        s2, u = f(jax.tree.map(jnp.copy, sc), grids, world)
        float(u.sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            s2, u = f(s2, grids, world)
        float(u.sum())
        ms = 1e3 * (time.perf_counter() - t0) / iters
        out[name] = round(ms, 3)
        log(f"{name}: {ms:.3f} ms/tick")

    print(json.dumps(out))
    with open("/tmp/tpu_mi_ablate.json", "w") as fjs:
        json.dump(out, fjs)
    log("done (clean exit)")


if __name__ == "__main__":
    main()

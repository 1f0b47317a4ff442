"""Round-5 MI refresh decomposition: where do the milliseconds actually go?

METHODOLOGY NOTE (hard-won, round 5): on this tunneled attachment, device
arrays CLOSED OVER by a jitted callable are re-uploaded per call (~6.5 GB/s
tunnel rate — a captured 500 MB world costs ~77 ms/call). Every operand must
be passed as an ARGUMENT. Chain timings with one scalar readback as usual.
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

    from bench import build_case_mi, _run_chain
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.ops.mi_kernel import phik_from_grid_pallas

    engine, sc, grids, world, domain = build_case_mi(S)
    cfg = engine.config  # frontier=3 default
    out = {}

    # 1. solve-only (phik precomputed and passed as an argument)
    phik0 = engine.phik_from_grid(grids, 3, domain=domain)

    def solve_only(s, ph, w):
        s2, u, d = engine._replan_fn(s, ph, w)
        return s2, u, d

    stepf = jax.jit(solve_only, donate_argnums=(0,))
    sc1, u, _ = stepf(sc, phik0, world)
    float(u.sum())
    dt, sc1 = _run_chain(stepf, sc1, phik0, world, iters=iters)
    out["solve_only_ms"] = round(1e3 * dt / iters, 3)
    log(f"solve-only tick: {out['solve_only_ms']} ms")

    # 2. standalone refreshes, self-chained via a zero-valued dependency
    def dense_fn(e):
        def f(g):
            ck = e._phik_grid_batch_dense_fn(g, domain, 3)
            eps = (ck[:, 0, 0] * 0.0)[:, None, None]
            return g._replace(data=g.data + eps)
        return jax.jit(f, donate_argnums=(0,))

    for fc in (3, 0):
        e2 = Engine(cfg.replace(mi_frontier_cells=fc))
        f = dense_fn(e2)
        g1 = f(jax.tree.map(jnp.copy, grids))
        t0 = time.perf_counter()
        for _ in range(iters):
            g1 = f(g1)
        float(g1.data.sum())
        out[f"dense_refresh_fc{fc}_ms"] = round(
            1e3 * (time.perf_counter() - t0) / iters, 3)
        log(f"dense refresh fc{fc}: {out[f'dense_refresh_fc{fc}_ms']} ms")

    # 3. Pallas MI kernel standalone (data as argument)
    g0 = jax.tree.map(lambda a: a[0], grids)

    def kern(data):
        ck = phik_from_grid_pallas(data, g0, domain, cfg.num_basis,
                                   cfg.grid_samples, 3, frontier_cells=3)
        eps = (ck[:, 0, 0] * 0.0)[:, None, None]
        return data + eps

    f = jax.jit(kern, donate_argnums=(0,))
    d1 = f(jnp.copy(grids.data))
    t0 = time.perf_counter()
    for _ in range(iters):
        d1 = f(d1)
    float(d1.sum())
    out["mi_kernel_fc3_ms"] = round(1e3 * (time.perf_counter() - t0) / iters, 3)
    log(f"mi kernel fc3 (incl pad): {out['mi_kernel_fc3_ms']} ms")

    # 4. serialized kernel+solve in ONE jit (the fold's serialized estimate)
    def both(s, g, w):
        ck = phik_from_grid_pallas(g.data, g0, domain, cfg.num_basis,
                                   cfg.grid_samples, 3, frontier_cells=3)
        s2, u, d = engine._replan_fn(s, ck, w)
        return s2, u

    f2 = jax.jit(both, donate_argnums=(0,))
    s2, u = f2(sc1, grids, world)
    float(u.sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        s2, u = f2(s2, grids, world)
    float(u.sum())
    out["kernel_plus_solve_ms"] = round(1e3 * (time.perf_counter() - t0) / iters, 3)
    log(f"kernel+solve one jit: {out['kernel_plus_solve_ms']} ms")

    print(json.dumps(out))
    with open("/tmp/tpu_mi5.json", "w") as fjs:
        json.dump(out, fjs)
    log("done (clean exit)")


if __name__ == "__main__":
    main()

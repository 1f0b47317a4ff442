"""Round-5 TPU re-baseline: GMM tick + MI tick variants after the quality
fixes (orbit guard, frontier mask, d_safe retune).

One long-lived process, clean exit (CLAUDE.md lease protocol). Prints one
JSON line per measurement.
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

    log(f"devices: {jax.devices()}")
    import jax.numpy as jnp

    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    log("claim + warm-up done")

    from bench import build_case, build_case_mi, _run_chain

    results = {}

    # ---- GMM one-kernel tick (the headline) ----
    engine, sc, gmm, domain, world = build_case(S)
    step = jax.jit(engine._refresh_and_replan_fn, donate_argnums=(0,))
    sc, u, diag = step(sc, gmm, domain, world)
    float(u.sum())
    for rep in range(2):
        dt, sc = _run_chain(step, sc, gmm, domain, world, iters=iters)
        r = S * iters / dt
        log(f"GMM tick rep{rep}: {r:,.0f} solves/s ({1e3 * dt / iters:.3f} ms/tick)")
        results[f"gmm_{rep}"] = round(r, 1)

    # ---- MI tick: dense path, round-5 default semantics (frontier=3) ----
    def mi_case(fc, use_kernel, tag):
        cfgv = engine.config.replace(mi_frontier_cells=fc)
        from ergodic_exploration_tpu.engine import Engine

        eng2 = Engine(cfgv)
        _, sc2, grids, world2, dom2 = build_case_mi(S)
        # rebuild with eng2 so the jit caches don't collide across configs
        sc2 = eng2.init_scenarios(np.asarray(jax.device_get(sc2.x)))
        stepm = jax.jit(
            lambda s, g, w: eng2._refresh_mi_and_replan_fn(
                s, g, w, 3, dom2, use_kernel),
            donate_argnums=(0,),
        )
        sc2, u2, _ = stepm(sc2, grids, world2)
        float(u2.sum())
        dt2, sc2 = _run_chain(stepm, sc2, grids, world2, iters=iters)
        r2 = S * iters / dt2
        log(f"MI {tag}: {r2:,.0f} solves/s ({1e3 * dt2 / iters:.3f} ms/tick)")
        results[f"mi_{tag}"] = round(r2, 1)

    mi_case(3, False, "dense_fc3")
    mi_case(0, False, "dense_fc0")
    mi_case(3, True, "kernel_fc3")
    mi_case(0, True, "kernel_fc0")

    print(json.dumps(results))
    with open("/tmp/tpu_r5_baseline.json", "w") as f:
        json.dump(results, f)
    log("done (clean exit)")


if __name__ == "__main__":
    main()

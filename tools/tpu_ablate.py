"""Ablation timing of the fused batched tick at S=4096 (round-3 perf work,
VERDICT item 3): instead of timing stages standalone (each pays its own
dispatch floor and hides XLA fusion), time the FULL tick with components
removed/resized — differences are the true incremental costs.

ONE process; never run concurrently with bench/tests on the TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    log("warm-up done")

    from bench import build_case
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    base_cfg = engine.config

    def tick_time(label, cfg=None, use_world=True, refresh=True, tile=None):
        if tile is not None:  # round-4: tile rides config (ADVICE r3 item 4)
            cfg = (cfg or base_cfg).replace(solve_tile=tile)
        eng = engine if cfg is None else Engine(cfg)
        try:
            if refresh:
                fn = lambda sc_, gmm_, world_: eng._refresh_and_replan_fn(
                    sc_, gmm_, domain, world_)[0]
                args = (sc, gmm, world)
            else:
                pk = jax.jit(eng._phik_from_gmm_fn)(gmm, domain, world.free_mask)
                fn = lambda sc_, pk_, world_: eng._replan_fn(sc_, pk_, world_)[0]
                args = (sc, pk, world)
            f = jax.jit(fn)
            jax.block_until_ready(f(*args))
            sec = time_chained(f, args, iters=iters, carry_index=None)
            log(f"{label:46s} {sec * 1e3:7.3f} ms  ({S / sec:,.0f}/s)")
            return sec
        except Exception as e:
            log(f"{label:46s} FAILED {type(e).__name__}: {str(e)[:120]}")
            return float("nan")

    results = {}
    results["full"] = tick_time("FULL tick (refresh+replan, fused)")
    results["replan"] = tick_time("replan only (no refresh)", refresh=False)
    results["no_safety"] = tick_time(
        "tick, safety OFF", base_cfg.replace(enable_safety=False))
    results["accumulate"] = tick_time(
        "tick, accumulate history (no ring sampling)",
        base_cfg.replace(history="accumulate"))
    results["patch24"] = tick_time(
        "tick, patch 24 (vs 32)", base_cfg.replace(patch_cells=24))
    results["patch16"] = tick_time(
        "tick, patch 16", base_cfg.replace(patch_cells=16))
    results["safety8"] = tick_time(
        "tick, safety crop 8 (vs 16)", base_cfg.replace(safety_patch_cells=8))
    results["tile64"] = tick_time("tick, kernel tile 64", tile=64)
    results["tile256"] = tick_time("tick, kernel tile 256", tile=256)
    results["tile512"] = tick_time("tick, kernel tile 512", tile=512)
    results["xla_refresh"] = tick_time(
        "tick, XLA dense refresh (no Pallas refresh)",
        base_cfg.replace(use_pallas=False))
    results["unfused"] = tick_time(
        "tick, UNFUSED solve (vmapped controller)",
        base_cfg.replace(use_fused_solve=False))

    print({k: round(v * 1e3, 3) for k, v in results.items()})
    d = lambda a, b: (results[a] - results[b]) * 1e3
    log(f"refresh cost        : {d('full', 'replan'):+.3f} ms")
    log(f"safety cost         : {d('full', 'no_safety'):+.3f} ms")
    log(f"ring-history cost   : {d('full', 'accumulate'):+.3f} ms")
    log(f"patch 32->24        : {d('full', 'patch24'):+.3f} ms")
    log(f"patch 32->16        : {d('full', 'patch16'):+.3f} ms")


if __name__ == "__main__":
    main()

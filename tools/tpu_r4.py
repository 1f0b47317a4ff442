"""Round-4 TPU validation + measurement: one-kernel tick, lazy DWA, MI
Pallas kernel. ONE process; never run concurrently with bench/tests on the
TPU. Each stage is independently try/except'd so one Mosaic rejection
doesn't kill the session.
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    log("warm-up done")

    from bench import build_case, build_case_mi
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    base = engine.config  # fused, shared maps, shared draw

    results = {}

    def stage(name, fn):
        try:
            t0 = time.time()
            out = fn()
            results[name] = out
            log(f"{name:44s} OK {out if isinstance(out, float) else ''}"
                f"  (+{time.time() - t0:.0f}s)")
        except Exception as e:
            results[name] = f"FAIL {type(e).__name__}"
            log(f"{name:44s} FAILED: {e}")
            traceback.print_exc(limit=4)

    def t_full_tick(cfg, mi=False, use_mi_kernel=False, label=""):
        eng = Engine(cfg)
        if mi:
            _, sc2, grids, world2, dom = build_case_mi(S)
            f = jax.jit(lambda s_, g_, w_: eng._refresh_mi_and_replan_fn(
                s_, g_, w_, 3, dom, use_mi_kernel)[0])
            args = (sc2, grids, world2)
        else:
            f = jax.jit(lambda s_, g_, w_: eng._refresh_and_replan_fn(
                s_, g_, domain, w_)[0])
            args = (sc, gmm, world)
        jax.block_until_ready(f(*args))
        sec = time_chained(f, args, iters=iters, carry_index=None)
        log(f"  {label:42s} {sec * 1e3:7.3f} ms  ({S / sec:,.0f}/s)")
        return sec * 1e3

    # --- A: GMM tick, round-3 two-stage path (baseline) ---
    stage("A two-stage tick (r3 path)", lambda: t_full_tick(
        base.replace(use_fused_solve=True), label="two-stage + lazy DWA"))

    # --- B: one-kernel tick (in-kernel refresh) ---
    stage("B one-kernel tick", lambda: t_full_tick(base, label="one-kernel + lazy DWA"))

    # --- C: lazy DWA off (isolate its contribution) ---
    import ergodic_exploration_tpu.ops.solve_kernel as sk
    import dataclasses as dc

    def no_lazy():
        orig = sk.params_from_config

        def patched(cfg):
            return dc.replace(orig(cfg), lazy_dwa=False)

        sk.params_from_config = patched
        try:
            return t_full_tick(base, label="one-kernel, lazy_dwa OFF")
        finally:
            sk.params_from_config = orig

    stage("C one-kernel, eager DWA", no_lazy)

    # --- D: MI tick, dense XLA path (round-3 baseline) ---
    stage("D MI tick dense (r3 path)", lambda: t_full_tick(
        base, mi=True, label="MI dense"))

    # --- E: MI tick, Pallas MI kernel (pack inside the tick) ---
    stage("E MI tick kernel", lambda: t_full_tick(
        base, mi=True, use_mi_kernel=True, label="MI kernel (pack in-tick)"))

    # --- F: solve_tile sweep on the one-kernel tick ---
    stage("F one-kernel tile 256", lambda: t_full_tick(
        base.replace(solve_tile=256), label="one-kernel tile=256"))

    log(f"RESULTS: { {k: (round(v, 3) if isinstance(v, float) else v) for k, v in results.items()} }")


if __name__ == "__main__":
    main()

"""A/B timing: XLA one-hot patch extraction vs in-kernel shared-map
extraction (solve_kernel.py section 0), plus a kernel tile sweep on the new
path (its (P, map_w, tile) row slab grows VMEM per tile).

ONE process; never run concurrently with bench/tests on the TPU.
"""

import sys
import time

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
    base = engine.config  # shared_maps=True, fused, shared draw

    def t_replan(label, cfg, tile=None):
        # tile rides the config (cfg.solve_tile -> plumbed through
        # replan_batched_fused to both fused kernels) — no mutation of
        # function defaults (ADVICE r3: the defaults-tuple hack silently
        # swept the wrong parameter if a kwarg was ever added/reordered).
        if tile is not None:
            cfg = cfg.replace(solve_tile=tile)
        eng = Engine(cfg)
        pk = jax.jit(eng._phik_from_gmm_fn)(gmm, domain, world.free_mask)
        f = jax.jit(lambda s_, p_, w_: eng._replan_fn(s_, p_, w_)[0])
        jax.block_until_ready(f(sc, pk, world))
        sec = time_chained(f, (sc, pk, world), iters=iters, carry_index=None)
        log(f"{label:48s} {sec * 1e3:7.3f} ms  ({S / sec:,.0f}/s)")
        return sec

    def t_full(label, cfg):
        eng = Engine(cfg)
        f = jax.jit(lambda s_, g_, w_: eng._refresh_and_replan_fn(
            s_, g_, domain, w_)[0])
        jax.block_until_ready(f(sc, gmm, world))
        sec = time_chained(f, (sc, gmm, world), iters=iters, carry_index=None)
        log(f"{label:48s} {sec * 1e3:7.3f} ms  ({S / sec:,.0f}/s)")
        return sec

    r = {}
    r["xla"] = t_replan("replan, XLA patch extraction",
                        base.replace(shared_maps=False))
    r["ik"] = t_replan("replan, IN-KERNEL shared-map extraction", base)
    # tile must be a multiple of 128 (lane-dim Mosaic block constraint)
    r["ik_t256"] = t_replan("replan, in-kernel, tile 256", base, tile=256)
    r["full_xla"] = t_full("FULL tick, XLA extraction (+unfolded mask)",
                           base.replace(shared_maps=False))
    r["full_ik"] = t_full("FULL tick, in-kernel extraction", base)
    print({k: round(v * 1e3, 3) for k, v in r.items()})
    log(f"replan delta: {(r['xla'] - r['ik']) * 1e3:+.3f} ms")


if __name__ == "__main__":
    main()

"""TPU validation + timing of the fused Pallas solve kernel at S=4096:
numerics vs the vmapped path, then full-step timing both ways. ONE process."""

import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    x = jnp.ones((8, 8))
    float((x @ x).sum())
    log("warm-up done")

    sys.path.insert(0, "/root/repo")
    from bench import build_case
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    phik = engine.phik_from_gmm(gmm, domain)

    results = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused))
        label = "fused" if fused else "vmapped"
        step_nd = jax.jit(eng._replan_fn)
        t0 = time.perf_counter()
        out = step_nd(sc, phik, world)
        u = out[1]
        u.block_until_ready()
        log(f"{label}: replan compile+run {time.perf_counter() - t0:.1f}s")
        results[label] = (np.asarray(u), np.asarray(out[2].ergodic_metric),
                          np.asarray(out[2].collision_code))

        dstep = jax.jit(eng._refresh_and_replan_fn, donate_argnums=(0,))
        o2 = dstep(jax.tree.map(jnp.copy, sc), gmm, domain, world)
        float(o2[1].sum())
        sec = time_chained(dstep, (o2[0], gmm, domain, world), iters=iters)
        log(f"{label}: full step {sec * 1e3:.2f} ms -> {S / sec:,.0f} solves/s")

    du = np.abs(results["fused"][0] - results["vmapped"][0]).max()
    dm = np.abs(results["fused"][1] - results["vmapped"][1]).max()
    dc = int((results["fused"][2] != results["vmapped"][2]).sum())
    log(f"max |delta u| {du:.3e}, max |delta metric| {dm:.3e}, "
        f"code mismatches {dc}/{S}")
    log("DONE")


if __name__ == "__main__":
    main()

"""Measure HIGH vs HIGHEST precision on the patch/query contractions:
stage times (extract, barrier, validate+dwa) + full-step time + max control
deviation. ONE process."""

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
    from ergodic_exploration_tpu.ops import patch as patch_mod
    from ergodic_exploration_tpu.ops.collision import validate_control
    from ergodic_exploration_tpu.ops.dwa import dwa_control
    from ergodic_exploration_tpu.ops.patch import extract_patch
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    # copies: sc is donated inside the timing chains below
    xs, vb = jnp.array(sc.x), jnp.array(sc.vb)
    model = engine.controller.model
    u0 = jnp.zeros((S, cfg.nu), jnp.float32)

    def chainable(fn):
        def f(arg):
            out = fn(arg)
            return out.sum() * 0.0 + arg, out
        return jax.jit(f)

    def stage_fns():
        def extract(x):
            return jax.vmap(lambda d, c: extract_patch(d, c, cfg.patch_cells).dist)(
                world.dist, x[:, :2]
            ).sum(axis=(1, 2), keepdims=True) + 0.0 * x[:, :1]

        patches = jax.vmap(lambda d, c: extract_patch(d, c, cfg.patch_cells))(
            world.dist, xs[:, :2]
        )

        def safety(u):
            code = jax.vmap(lambda x0, uu, pa, dm: validate_control(model, x0, uu, dm, pa, cfg),
                            in_axes=(0, 0, 0, 0))(xs, u, patches, world.domain)
            ud, feas = jax.vmap(lambda x0, v, uu, pa, dm: dwa_control(model, x0, v, uu, dm, pa, cfg),
                                in_axes=(0, 0, 0, 0, 0))(xs, vb, u, patches, world.domain)
            return ud * 0.0 + u + 0.0 * code[:, None].astype(jnp.float32) + 0.0 * feas[:, None]

        return extract, safety

    results = {}
    for prec_name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                            ("HIGH", jax.lax.Precision.HIGH)):
        patch_mod._EXACT = prec
        log(f"--- patch precision {prec_name} ---")
        extract, safety = stage_fns()
        for name, fn, arg in (("extract_patch", extract, xs), ("validate+dwa", safety, u0)):
            f = chainable(fn)
            out = f(arg)
            jax.tree.map(lambda a: a.block_until_ready(), out)
            sec = time_chained(f, (arg,), iters=iters)
            log(f"  {name:16s} {sec * 1e3:6.2f} ms")

        # full step (fresh engine so jit caches don't mix precisions)
        eng2 = Engine(cfg)
        step = jax.jit(eng2._refresh_and_replan_fn)  # no donation: need repeatable sc
        out = step(sc, gmm, domain, world)
        u = out[1]
        u.block_until_ready()
        results[prec_name] = np.asarray(u)
        dstep = jax.jit(eng2._refresh_and_replan_fn, donate_argnums=(0,))
        o2 = dstep(jax.tree.map(jnp.copy, sc), gmm, domain, world)
        float(o2[1].sum())
        sec = time_chained(dstep, (o2[0], gmm, domain, world), iters=iters)
        log(f"  full step        {sec * 1e3:6.2f} ms -> {S / sec:,.0f} solves/s")

    du = np.abs(results["HIGH"] - results["HIGHEST"]).max()
    log(f"max |delta u| HIGH vs HIGHEST over {S} scenarios: {du:.3e} "
        f"(u scale {np.abs(results['HIGHEST']).max():.3f})")
    log("DONE")


if __name__ == "__main__":
    main()

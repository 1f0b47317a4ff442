"""A/B the lazy_dwa tile predicate on the bench workload: alternating
timed repeats in ONE process so compile/claim variance cancels. Decides
the SolveParams.lazy_dwa default (round-4 single-shot runs disagreed
inside the ~0.17 ms noise band)."""

import dataclasses as dc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    log("warm-up done")

    from bench import build_case
    import ergodic_exploration_tpu.ops.solve_kernel as sk
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters, reps = 4096, 30, 4
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    orig = sk.params_from_config

    fns = {}
    for lazy in (False, True):
        def patched(c, _lazy=lazy):
            return dc.replace(orig(c), lazy_dwa=_lazy)

        sk.params_from_config = patched
        try:
            eng = Engine(cfg)
            f = jax.jit(lambda s_, g_, w_, _e=eng: _e._refresh_and_replan_fn(
                s_, g_, domain, w_)[0])
            jax.block_until_ready(f(sc, gmm, world))
            fns[lazy] = f
        finally:
            sk.params_from_config = orig

    res = {False: [], True: []}
    for rep in range(reps):
        for lazy in (False, True):
            sec = time_chained(fns[lazy], (sc, gmm, world), iters=iters,
                               carry_index=None)
            res[lazy].append(sec * 1e3)
            log(f"rep {rep} lazy={lazy}: {sec * 1e3:7.3f} ms")
    for lazy in (False, True):
        a = np.asarray(res[lazy])
        log(f"lazy={lazy}: mean {a.mean():.3f} ms  min {a.min():.3f}  "
            f"max {a.max():.3f}")
    d = np.asarray(res[True]).mean() - np.asarray(res[False]).mean()
    log(f"lazy - eager = {d:+.3f} ms  -> default should be "
        f"{'True' if d < 0 else 'False'} on the bench workload")


if __name__ == "__main__":
    main()

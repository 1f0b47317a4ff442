"""TPU validation + sc sweep of the Pallas MI-refresh kernel (round 4).

Checks standalone parity vs the dense XLA refresh, sweeps the scenario
chunk sc, then times the FULL MI tick both ways. ONE process.
"""

import os
import sys
import time
import traceback

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

    from bench import build_case_mi
    from ergodic_exploration_tpu.ops.mi_kernel import phik_from_grid_pallas
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters, r = 4096, 30, 3
    engine, sc0, grids, world, domain = build_case_mi(S)
    K = engine.config.num_basis
    gs = engine.config.grid_samples

    # --- dense XLA refresh (reference numerics) ---
    # chained-timing wrapper: feed the grids back with a 0-valued dependency
    # on the refresh so iterations serialize (adds one identical (S,H,W)
    # HBM pass to BOTH paths — relative comparison unaffected)
    def chain_wrap(refresh_fn):
        return jax.jit(lambda g: g._replace(
            data=g.data + 0.0 * refresh_fn(g).sum()))

    dense = jax.jit(lambda g: engine._phik_grid_batch_dense_fn(g, domain, r))
    phik_ref = np.asarray(dense(grids))
    dstep = chain_wrap(lambda g: engine._phik_grid_batch_dense_fn(g, domain, r))
    sec = time_chained(dstep, (grids,), iters=iters, carry_index=None)
    log(f"dense refresh standalone: {sec * 1e3:7.3f} ms (incl chain pass)")

    g0 = jax.tree.map(lambda a: a[0], grids)

    # --- kernel sc x blur-mode sweep: parity + standalone timing ---
    for mode in ("xdot", "rolls"):
        for sc in (8, 16, 32):
            try:
                raw = lambda g, _sc=sc, _m=mode: phik_from_grid_pallas(
                    g.data, g0, domain, K, gs, r, sc=_sc, blur_mode=_m)
                t0 = time.time()
                phik_k = np.asarray(jax.jit(raw)(grids))
                err = np.abs(phik_k - phik_ref).max()
                sec = time_chained(chain_wrap(raw), (grids,), iters=iters,
                                   carry_index=None)
                log(f"kernel {mode:5s} sc={sc:3d}: {sec * 1e3:7.3f} ms  "
                    f"max|dphik|={err:.3e}  (compile {time.time() - t0:.0f}s)")
            except Exception as e:
                log(f"kernel {mode:5s} sc={sc:3d}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")
                traceback.print_exc(limit=2)

    # --- full MI tick: dense vs kernel ---
    for use_k, label in ((False, "MI tick dense"), (True, "MI tick kernel")):
        try:
            f = jax.jit(lambda s_, g_, w_, _u=use_k: engine._refresh_mi_and_replan_fn(
                s_, g_, w_, r, domain, _u)[0])
            jax.block_until_ready(f(sc0, grids, world))
            sec = time_chained(f, (sc0, grids, world), iters=iters,
                               carry_index=None)
            log(f"{label:16s}: {sec * 1e3:7.3f} ms  ({S / sec:,.0f}/s)")
        except Exception as e:
            log(f"{label:16s}: FAILED {type(e).__name__}: {str(e)[:200]}")
            traceback.print_exc(limit=2)

    log("DONE")


if __name__ == "__main__":
    main()

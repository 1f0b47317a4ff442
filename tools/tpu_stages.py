"""Per-stage timing of the fused batched tick at S=4096 on TPU (round-2
perf work, VERDICT item 4): where do the ~5.9 ms/step go, and what did the
free-space mask cost? ONE process; never run concurrently with bench/tests.

Each stage is timed as its own jitted chained loop (utils/profiling.py
methodology: N dependent steps, one scalar readback).
"""

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
    from ergodic_exploration_tpu.ops import basis
    from ergodic_exploration_tpu.ops.patch import extract_patch
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    K = cfg.num_basis
    model = engine.controller.model

    def chain(label, fn, args):
        # every stage fn here returns its own carry (first arg feeds back)
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        f = jax.jit(fn)
        sec = time_chained(f, args, iters=iters, carry_index=None)
        log(f"{label:34s} {sec * 1e3:7.3f} ms")
        return sec

    results = {}

    # ---- full tick (masked vs unmasked refresh) ----
    def tick(sc_, gmm_, world_):
        return engine._refresh_and_replan_fn(sc_, gmm_, domain, world_)[0]

    world_nomask = world._replace(free_mask=None)
    results["tick_masked"] = chain("full tick (masked refresh)", tick,
                                   (sc, gmm, world))
    results["tick_unmasked"] = chain("full tick (unmasked refresh)", tick,
                                     (sc, gmm, world_nomask))

    # ---- stage: phik refresh ----
    def refresh(g, mask):
        return engine._phik_from_gmm_fn(g, domain, mask)

    pk = jax.jit(refresh)(gmm, world.free_mask)
    results["refresh_masked"] = chain(
        "phik refresh (masked)",
        lambda g, m: (g._replace(weights=g.weights + 0 * refresh(g, m)[:, 0, 0, None]), m)[0],
        (gmm, world.free_mask))
    results["refresh_unmasked"] = chain(
        "phik refresh (unmasked)",
        lambda g: g._replace(weights=g.weights + 0 * refresh(g, None)[:, 0, 0, None]),
        (gmm,))

    # ---- XLA-dense refresh (use_pallas=False path) for comparison ----
    from ergodic_exploration_tpu.engine import Engine

    engine_xla = Engine(cfg.replace(use_pallas=False))

    def refresh_xla(g, mask):
        return engine_xla._phik_from_gmm_fn(g, domain, mask)

    results["refresh_xla_masked"] = chain(
        "phik refresh (XLA dense, masked)",
        lambda g, m: (g._replace(weights=g.weights + 0 * refresh_xla(g, m)[:, 0, 0, None]), m)[0],
        (gmm, world.free_mask))

    # ---- stage: MI refresh (config 4, gather-free paths) ----
    from bench import build_case_mi

    _, sc_mi, grids_mi, world_mi, dom_mi = build_case_mi(S)

    def mi_refresh_sep(g):
        pk_ = jax.vmap(lambda g1: engine._phik_grid_one(g1, 3))(g)
        return g._replace(resolution=g.resolution + 0 * pk_[:, 0, 0])

    results["refresh_mi_sep"] = chain("MI refresh (separable, r=3)",
                                      mi_refresh_sep, (grids_mi,))

    def mi_refresh_dense(g):
        pk_ = engine._phik_grid_batch_dense_fn(g, dom_mi, 3)
        return g._replace(resolution=g.resolution + 0 * pk_[:, 0, 0])

    results["refresh_mi_dense"] = chain("MI refresh (dense resample, r=3)",
                                        mi_refresh_dense, (grids_mi,))

    def tick_mi(sc_, g_, w_):
        return engine._refresh_mi_and_replan_fn(sc_, g_, w_, 3, dom_mi)[0]

    results["tick_mi"] = chain("full tick (MI dense refresh)", tick_mi,
                               (sc_mi, grids_mi, world_mi))

    # ---- stage: patch extraction ----
    def patch_stage(x_):
        p = jax.vmap(lambda d, c: extract_patch(d, c, cfg.patch_cells))(
            world.dist, x_[:, :2])
        return x_ + 0 * p.dist[:, 0, 0][:, None]

    results["patch"] = chain("patch extraction (32x32)", patch_stage, (sc.x,))

    # ---- stage: history reduction (ring + batch sampling) ----
    def hist_stage(st):
        split = jax.vmap(jax.random.split)(st.rng)
        sub = split[:, 1]

        def one(buf, sb, dom):
            hkl = basis.hk_norm(K, dom.lengths)
            s_buf, n_hist = buf.sample_states(cfg.buffer_batch, sb)
            Cbx, Cby = basis.cos_tables(s_buf, K, dom)
            w = jnp.full(s_buf.shape[0], jnp.where(n_hist > 0, 1.0, 0.0))
            return basis.coefficients_cos(Cbx, Cby, w, hkl)

        h = jax.vmap(one)(st.buffer, sub, world.domain)
        return st._replace(rng=split[:, 0] + 0 * h[:, 0, 0].astype(jnp.uint32)[:, None])

    results["history"] = chain("history reduction (B=100)", hist_stage, (sc.state,))

    # ---- stage: buffer append + ck_sum update ----
    def append_stage(st):
        nb = jax.vmap(lambda b, p: b.append(p))(st.buffer, sc.x[:, :2])
        return st._replace(buffer=nb)

    results["append"] = chain("buffer append + cksum", append_stage, (sc.state,))

    # ---- replan without refresh (patch + solve + safety + state update) ----
    pk4 = jax.jit(engine._phik_from_gmm_fn)(gmm, domain, world.free_mask)

    def replan_only(sc_, pk_, world_):
        return engine._replan_fn(sc_, pk_, world_)[0]

    results["replan_only"] = chain("replan (no refresh)", replan_only,
                                   (sc, pk4, world))

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()

"""TPU tuning session: validate the Pallas target-refresh kernel on hardware
and sweep the scan unroll factor — all in ONE long-lived process (this
attachment degrades when claimants are killed; see CLAUDE.md).

Writes progress lines to stdout as it goes so a background runner can watch.

Phases:
  1. warm-up (tiny op) — absorbs any lease backlog.
  2. numerics: Pallas phik_from_gmm vs the XLA path on TPU (S=64).
  3. full-step timing, S=4096: XLA refresh (baseline), Pallas refresh.
  4. scan-unroll sweep on the full step: 1 / 4 / 8 / 20.
  5. stage micro-times: refresh-only, replan-only.
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
    # warm-up: absorb lease backlog before timing anything
    t0 = time.perf_counter()
    x = jnp.ones((8, 8))
    float((x @ x).sum())
    log(f"warm-up op done in {time.perf_counter() - t0:.1f}s")

    sys.path.insert(0, "/root/repo")
    from bench import build_case
    from ergodic_exploration_tpu.ops import basis
    from ergodic_exploration_tpu.ops import target as target_ops
    from ergodic_exploration_tpu.ops.pallas_kernels import phik_from_gmm_pallas
    from ergodic_exploration_tpu.utils.profiling import time_chained

    # ---------------- phase 2: Pallas numerics on TPU ----------------
    log("phase 2: pallas numerics (S=64)")
    engine, sc, gmm, domain, world = build_case(64)
    cfg = engine.config
    K = cfg.num_basis
    pts = domain.sample_lattice(cfg.grid_samples)
    tbl = basis.tables(pts, K, domain)
    hk = basis.hk_norm(K, domain.lengths)
    D = basis.dense_table(tbl, hk)

    t0 = time.perf_counter()
    try:
        out_p = phik_from_gmm_pallas(gmm.means, gmm.covs, gmm.weights, pts, D)
        out_p.block_until_ready()
        ok = True
    except Exception as e:
        log(f"PALLAS COMPILE/RUN FAILED: {e!r}")
        ok = False
    log(f"pallas mosaic compile+run: {time.perf_counter() - t0:.1f}s ok={ok}")

    if ok:
        phi = jax.vmap(lambda g: target_ops.gmm_target_values(pts, g))(gmm)
        out_x = basis.coefficients_dense(phi, D, K).reshape(64, K * K)
        err = float(jnp.max(jnp.abs(out_p - out_x)))
        scale = float(jnp.max(jnp.abs(out_x)))
        log(f"pallas vs xla: max abs err {err:.3e} (scale {scale:.3e})")
        if not np.isfinite(err) or err > 1e-4 * max(scale, 1.0):
            log("NUMERICS MISMATCH -> skipping pallas timing")
            ok = False

    # ---------------- phase 3+4: full-step timings, S=4096 ----------------
    S, iters = 4096, 30

    def time_step(use_pallas: bool, unroll: int, label: str):
        from ergodic_exploration_tpu.engine import Engine

        eng, sc, gmm, dom, wld = build_case(S)
        c2 = eng.config.replace(use_pallas=use_pallas, scan_unroll=unroll)
        eng2 = Engine(c2)
        step = jax.jit(eng2._refresh_and_replan_fn, donate_argnums=(0,))
        t0 = time.perf_counter()
        out = step(sc, gmm, dom, wld)
        float(out[1].sum())
        log(f"  {label}: compile {time.perf_counter() - t0:.1f}s")
        sc = out[0]  # the compile call donated the original sc
        sec = time_chained(step, (sc, gmm, dom, wld), iters=iters)
        log(f"  {label}: {sec * 1e3:.2f} ms/step -> {S / sec:,.0f} solves/s")
        return sec

    log("phase 3: full-step timing (S=4096, 30 chained iters)")
    base = time_step(False, 4, "xla-refresh unroll=4 (baseline)")
    if ok:
        pal = time_step(True, 4, "pallas-refresh unroll=4")
        log(f"  pallas speedup vs baseline: {base / pal:.3f}x")

    log("phase 4: unroll sweep (xla refresh)")
    results = {4: base}
    for u in (1, 8, 20):
        results[u] = time_step(False, u, f"xla-refresh unroll={u}")
    best = min(results, key=results.get)
    log(f"  best unroll: {best} ({results[best] * 1e3:.2f} ms)")

    if ok:
        log("phase 4b: pallas + best unroll")
        pal_best = time_step(True, best, f"pallas-refresh unroll={best}")
        log(f"  pallas+unroll{best}: {pal_best * 1e3:.2f} ms")

    # ---------------- phase 5: stage micro-times ----------------
    log("phase 5: stage micro-times (S=4096, baseline config)")
    eng, sc, gmm, dom, wld = build_case(S)

    refresh = jax.jit(lambda g: eng._phik_from_gmm_fn(g, dom))
    phik = refresh(gmm)
    float(phik.sum())
    # refresh has no natural carry; chain via a dummy dependency on means
    def refresh_chain(g_means):
        out = refresh(gmm._replace(means=g_means))
        return (out.sum() * 0.0 + g_means, out)
    rc = jax.jit(refresh_chain)
    sec = time_chained(rc, (gmm.means,), iters=iters)
    log(f"  refresh-only: {sec * 1e3:.2f} ms")

    replan = jax.jit(eng._replan_fn, donate_argnums=(0,))
    out = replan(sc, phik, wld)
    float(out[1].sum())
    sc = out[0]  # donated
    sec = time_chained(replan, (sc, phik, wld), iters=iters)
    log(f"  replan-only: {sec * 1e3:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()

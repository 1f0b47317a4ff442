"""Focused TPU session: (a) HIGHEST-precision Pallas refresh — numerics +
timing vs the XLA path; (b) sub-stage micro-profile of the 4096-scenario
replan to find where its ~12.6 ms goes. ONE process (see CLAUDE.md)."""

import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    x = jnp.ones((8, 8))
    float((x @ x).sum())
    log(f"warm-up {time.perf_counter() - t0:.1f}s")

    sys.path.insert(0, "/root/repo")
    from bench import build_case
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.ops import basis
    from ergodic_exploration_tpu.ops import target as target_ops
    from ergodic_exploration_tpu.ops.pallas_kernels import phik_from_gmm_pallas
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    K = cfg.num_basis
    pts = domain.sample_lattice(cfg.grid_samples)
    tbl = basis.tables(pts, K, domain)
    hk = basis.hk_norm(K, domain.lengths)
    D = basis.dense_table(tbl, hk)

    # ---------------- (a) pallas numerics + timing ----------------
    log("pallas numerics (S=64, HIGHEST dot)")
    g64 = jax.tree.map(lambda a: a[:64], gmm)
    out_p = phik_from_gmm_pallas(g64.means, g64.covs, g64.weights, pts, D)
    phi = jax.vmap(lambda g: target_ops.gmm_target_values(pts, g))(g64)
    out_x = basis.coefficients_dense(phi, D, K).reshape(64, K * K)
    err = float(jnp.max(jnp.abs(out_p - out_x)))
    scale = float(jnp.max(jnp.abs(out_x)))
    log(f"pallas vs xla: max abs err {err:.3e} (scale {scale:.3e})")
    ok = np.isfinite(err) and err <= 1e-4 * max(scale, 1.0)
    if not ok:
        log("NUMERICS MISMATCH — pallas timing still reported for reference")

    def chainable(fn):  # chain via a dummy means dependency
        def f(means):
            out = fn(means)
            return out.sum() * 0.0 + means, out
        return jax.jit(f)

    xla_refresh = chainable(lambda m: engine._phik_from_gmm_fn(gmm._replace(means=m), domain))
    sec = time_chained(xla_refresh, (gmm.means,), iters=iters)
    log(f"refresh XLA:    {sec * 1e3:.2f} ms")

    pal_refresh = chainable(
        lambda m: phik_from_gmm_pallas(m, gmm.covs, gmm.weights, pts, D)
    )
    t0 = time.perf_counter()
    sec = time_chained(pal_refresh, (gmm.means,), iters=iters)
    log(f"refresh Pallas: {sec * 1e3:.2f} ms (incl compile {time.perf_counter() - t0:.0f}s before chain)")

    # ---------------- (b) replan sub-stage micro-profile ----------------
    log("replan sub-stages (S=4096, chained, ms per batched call)")
    from ergodic_exploration_tpu.controller import ErgodicController
    from ergodic_exploration_tpu.ops.barrier import barrier as barrier_op
    from ergodic_exploration_tpu.ops.collision import validate_control
    from ergodic_exploration_tpu.ops.dwa import dwa_control
    from ergodic_exploration_tpu.ops.integrator import costate_solve, rollout
    from ergodic_exploration_tpu.ops.patch import extract_patch

    ctrl = ErgodicController(cfg)
    model = ctrl.model
    xs = sc.x  # (S, 3)
    Us = sc.state.U  # (S, H, nu)
    H = cfg.horizon

    def timeit(name, fn, arg):
        f = chainable(fn)
        out = f(arg)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        sec = time_chained(f, (arg,), iters=iters)
        log(f"  {name:24s} {sec * 1e3:6.2f} ms")

    # patch extraction (one per scenario per tick)
    timeit("extract_patch", lambda x: jax.vmap(
        lambda d, c: extract_patch(d, c, cfg.patch_cells).dist
    )(world.dist, x[:, :2]).sum(axis=(1, 2), keepdims=True) + 0.0 * x[:, :1], xs)

    # rollout scan
    timeit("rollout(H=20)", lambda x: jax.vmap(
        lambda x0, U: rollout(model, x0, U, cfg.dt, unroll=cfg.scan_unroll)
    )(x, Us).sum(axis=(1, 2), keepdims=True) * 0.0 + x[:, :1], xs)

    # basis tables + ck + gradient at knots
    X = jax.vmap(lambda x0, U: rollout(model, x0, U, cfg.dt))(xs, Us)
    P = X[:, :-1, :2]  # (S, H, 2)
    lam = basis.lambda_weights(K)
    phik0 = engine._phik_from_gmm_fn(gmm, domain)

    def basis_grad(Pb):
        def one(Pp, pk):
            tb = basis.tables(Pp, K, domain)
            rs = basis.coefficients(tb, jnp.ones(H, jnp.float32), hk)
            ck = rs / H
            return basis.ergodic_gradient(tb, ck, pk, lam, hk, jnp.float32(H)).sum()
        return jax.vmap(one)(Pb, phik0)[:, None] * 0.0 + Pb[:, :1, 0]

    timeit("basis ck+grad", basis_grad, P)

    # barrier at knots (needs patches)
    patches = jax.vmap(lambda d, c: extract_patch(d, c, cfg.patch_cells))(world.dist, xs[:, :2])

    def barrier_fn(Pb):
        bval, bgrad = jax.vmap(lambda p, pa, dm: barrier_op(p, dm, pa, cfg),
                               in_axes=(0, 0, 0))(Pb, patches, world.domain)
        return bgrad.sum(axis=(1, 2), keepdims=True) * 0.0 + Pb[:, :1, 0]

    timeit("barrier", barrier_fn, P)

    # co-state backward
    As = jax.vmap(lambda Xk, U: model.A(Xk[:-1], U))(X, Us)
    gs = jnp.zeros((S, H, 3), jnp.float32)

    def co_fn(g):
        return jax.vmap(lambda A, gg: costate_solve(A, gg, cfg.dt, unroll=cfg.scan_unroll))(
            As, g
        ).sum(axis=(1, 2), keepdims=True)[:, :, 0] * 0.0 + g[:, :1, 0]

    timeit("costate(H=20)", co_fn, gs)

    # validation + DWA
    u0 = jnp.zeros((S, cfg.nu), jnp.float32)
    vb = sc.vb

    def safety_fn(u):
        code = jax.vmap(lambda x0, uu, pa, dm: validate_control(model, x0, uu, dm, pa, cfg),
                        in_axes=(0, 0, 0, 0))(xs, u, patches, world.domain)
        ud, feas = jax.vmap(lambda x0, v, uu, pa, dm: dwa_control(model, x0, v, uu, dm, pa, cfg),
                            in_axes=(0, 0, 0, 0, 0))(xs, vb, u, patches, world.domain)
        return ud * 0.0 + u + 0.0 * code[:, None].astype(jnp.float32) + 0.0 * feas[:, None]

    timeit("validate+dwa", safety_fn, u0)

    # buffer append + sampled history reduction
    bufs = sc.state.buffer
    rngs = sc.state.rng

    def buf_fn(p):
        nb = jax.vmap(lambda b, q: b.append(q))(bufs, p)
        sub = jax.vmap(lambda r: jax.random.split(r)[1])(rngs)
        sbuf, n = jax.vmap(lambda b, r: b.sample_states(cfg.buffer_batch, r))(nb, sub)
        def hist_one(sb, dom_o):
            Cbx, Cby = basis.cos_tables(sb, K, domain)
            return basis.coefficients_cos(Cbx, Cby, jnp.ones(sb.shape[0], jnp.float32), hk)
        hs = jax.vmap(lambda sb: hist_one(sb, None))(sbuf)
        return hs.sum(axis=(1, 2), keepdims=True)[:, :1] * 0.0 + p[:, :1] + 0.0 * n[:, None].astype(jnp.float32)

    timeit("buffer append+hist", buf_fn, xs[:, :2])

    log("DONE")


if __name__ == "__main__":
    main()

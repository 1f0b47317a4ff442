"""Micro-profile the buffer/history stage components at S=4096:
append blend, RNG (split+uniform), one-hot compaction matmul, cos tables +
history coefficients. Also re-times the cropped safety stage. ONE process."""

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
    from ergodic_exploration_tpu.ops.collision import validate_control
    from ergodic_exploration_tpu.ops.dwa import dwa_control
    from ergodic_exploration_tpu.ops.patch import extract_patch
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters = 4096, 30
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    K = cfg.num_basis
    hk = basis.hk_norm(K, domain.lengths)
    xs = jnp.array(sc.x)
    vb = jnp.array(sc.vb)
    bufs = sc.state.buffer
    rngs = sc.state.rng
    model = engine.controller.model
    B = cfg.buffer_batch

    def chainable(fn):
        def f(arg):
            out = fn(arg)
            return out.sum() * 0.0 + arg, out
        return jax.jit(f)

    def timeit(name, fn, arg):
        f = chainable(fn)
        out = f(arg)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        sec = time_chained(f, (arg,), iters=iters)
        log(f"  {name:24s} {sec * 1e3:6.2f} ms")

    log(f"buffer components (S={S}, cap={cfg.buffer_capacity}, batch={B})")

    # (a) append blend
    timeit("append", lambda p: jax.vmap(lambda b, q: b.append(q).states)(bufs, p)
           .sum(axis=(1, 2), keepdims=True)[:, :1] * 0.0 + p[:, :1], xs[:, :2])

    # (b) RNG split + uniform draws
    def rng_only(z):
        sub = jax.vmap(lambda r: jax.random.split(r)[1])(rngs)
        u = jax.vmap(lambda r: jax.random.uniform(r, (B,)))(sub)
        return u.sum(axis=1, keepdims=True) * 0.0 + z
    timeit("rng split+uniform", rng_only, xs[:, :1])

    # (c) compaction: one-hot build + matmul (fixed indices)
    idx = jnp.tile(jnp.arange(B, dtype=jnp.int32)[None], (S, 1))
    def compact(z):
        cap = cfg.buffer_capacity
        oh = (idx[:, :, None] == jnp.arange(cap)[None, None, :]).astype(jnp.float32)
        st = jnp.einsum("sbc,sct->sbt", oh, bufs.states,
                        precision=jax.lax.Precision.HIGHEST)
        return st.sum(axis=(1, 2), keepdims=True)[:, :, 0] * 0.0 + z
    timeit("one-hot compaction", compact, xs[:, :1])

    # (d) cos tables + coefficients on the compacted batch
    sbuf = jnp.zeros((S, B, 2), jnp.float32) + 0.5
    def hist(z):
        def one(sb):
            Cx, Cy = basis.cos_tables(sb, K, domain)
            return basis.coefficients_cos(Cx, Cy, jnp.ones(sb.shape[0], jnp.float32), hk)
        return jax.vmap(one)(sbuf).sum(axis=(1, 2), keepdims=True)[:, :, 0] * 0.0 + z
    timeit("cos+coefficients", hist, xs[:, :1])

    # cropped safety stage re-measure
    patches = jax.vmap(lambda d, c: extract_patch(d, c, cfg.patch_cells))(world.dist, xs[:, :2])
    crops = jax.vmap(lambda p: p.center_crop(cfg.safety_patch_cells))(patches)
    u0 = jnp.zeros((S, cfg.nu), jnp.float32)
    def safety(u):
        code = jax.vmap(lambda x0, uu, pa, dm: validate_control(model, x0, uu, dm, pa, cfg),
                        in_axes=(0, 0, 0, 0))(xs, u, crops, world.domain)
        ud, feas = jax.vmap(lambda x0, v, uu, pa, dm: dwa_control(model, x0, v, uu, dm, pa, cfg),
                            in_axes=(0, 0, 0, 0, 0))(xs, vb, u, crops, world.domain)
        return ud * 0.0 + u + 0.0 * code[:, None].astype(jnp.float32) + 0.0 * feas[:, None]
    timeit("validate+dwa (crop)", safety, u0)

    log("DONE")


if __name__ == "__main__":
    main()

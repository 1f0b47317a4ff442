"""MI-kernel (v2, native-layout) interior ablation on TPU: time variants
with stages removed to localize cost. ONE process."""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices: {jax.devices()}")
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    log("warm-up done")

    from bench import build_case_mi
    from ergodic_exploration_tpu.ops import mi_kernel as mk
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S, iters, r, sc = 4096, 30, 3, 32
    engine, sc0, grids, world, domain = build_case_mi(S)
    K = engine.config.num_basis
    h, w = 100, 100
    Kp = 128
    cxA, cyA, _, _ = mk.mi_operands(
        jax.tree.map(lambda a: a[0], grids), domain, K,
        engine.config.grid_samples, r, Kp)
    cxA, cyA = np.asarray(cxA), np.asarray(cyA)

    _DEF = jax.lax.Precision.DEFAULT
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=_DEF)
    OT, EPS = 0.65, 1e-6

    def make_variant(mode):
        def kernel(b_r, cxa_r, cya_r, out_r):
            b = b_r[:, :]  # (sc*h, w)
            if mode == "loadonly":
                out_r[:, :] = jnp.zeros(out_r.shape, jnp.float32) + b[0, 0]
                return
            if mode == "nolog":
                e = jnp.where(b < 0.0, 0.5, b)
            else:
                p = jnp.clip(jnp.where(b < 0.0, 0.5, b), EPS, 1.0 - EPS)
                e = -(p * jnp.log(p) + (1.0 - p) * jnp.log1p(-p))
            z = (b < OT).astype(jnp.float32)

            if mode == "noblur":
                ebb = e
            else:
                ix = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
                iy = jax.lax.rem(
                    jax.lax.broadcasted_iota(jnp.int32, b.shape, 0),
                    jnp.int32(h))
                eb = e
                dn, up = e, e
                for _ in range(r):
                    dn = jnp.where(ix >= 1, jnp.roll(dn, 1, axis=1), dn)
                    up = jnp.where(ix < w - 1, jnp.roll(up, -1, axis=1), up)
                    eb = eb + dn + up
                ebb = eb
                dn, up = eb, eb
                for _ in range(r):
                    dn = jnp.where(iy >= 1, jnp.roll(dn, 1, axis=0), dn)
                    up = jnp.where(iy < h - 1, jnp.roll(up, -1, axis=0), up)
                    ebb = ebb + dn + up
            vals = jnp.maximum(ebb * z, 0.0)

            if mode == "novals":  # skip both dots + transpose
                out_r[:, :] = jnp.zeros(out_r.shape, jnp.float32) + vals[0, 0]
                return
            if mode in ("w1d1", "alld1"):
                w1 = d(vals, cxa_r[:, :])
            else:
                w1 = mk._split_dot3(vals, cxa_r[:, :])  # (sc*h, Kp)
            if mode == "notrans":  # skip transpose + final dot
                out_r[:, :] = jnp.zeros(out_r.shape, jnp.float32) + w1[0, 0]
                return
            w2 = jnp.transpose(w1.reshape(sc, h, Kp), (1, 0, 2)).reshape(
                h, sc * Kp)
            if mode == "nofinal":
                out_r[:, :] = w2[:out_r.shape[0], :]
                return
            if mode in ("outd1", "alld1"):
                out_r[:, :] = d(cya_r[:, :], w2)
            else:
                out_r[:, :] = mk._split_dot3(cya_r[:, :], w2)

        return kernel

    data2 = jnp.asarray(np.asarray(grids.data)).reshape(S * h, w)

    def run_variant(mode):
        f = pl.pallas_call(
            make_variant(mode),
            grid=(S // sc,),
            in_specs=[
                pl.BlockSpec((sc * h, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, Kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, sc * Kp), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, S * Kp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )

        @jax.jit
        def step(x):
            return x + 1e-30 * f(x, cxA, cyA)[0, 0]

        jax.block_until_ready(step(data2))
        sec = time_chained(step, (data2,), iters=iters, carry_index=None)
        return sec * 1e3

    for mode in ("full", "loadonly", "nolog", "noblur", "novals", "w1d1",
                 "notrans", "nofinal", "outd1", "alld1"):
        try:
            ms = run_variant(mode)
            log(f"variant {mode:9s}: {ms:7.3f} ms")
        except Exception as e:
            log(f"variant {mode:9s}: FAILED {type(e).__name__}: {str(e)[:160]}")
            traceback.print_exc(limit=2)

    log("DONE")


if __name__ == "__main__":
    main()

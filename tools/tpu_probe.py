"""Empirical Mosaic probe for the target-refresh kernel: try layout variants
one at a time on the TPU, log compile success / scoped-vmem failures, and
time the survivors. ONE process."""

import functools
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices: {jax.devices()}")
    x = jnp.ones((8, 8))
    float((x @ x).sum())
    log("warm-up done")

    sys.path.insert(0, "/root/repo")
    from bench import build_case
    from ergodic_exploration_tpu.ops import basis
    from ergodic_exploration_tpu.ops import target as target_ops
    from ergodic_exploration_tpu.utils.profiling import time_chained

    S = 4096
    engine, sc, gmm, domain, world = build_case(S)
    cfg = engine.config
    K = cfg.num_basis
    pts = domain.sample_lattice(cfg.grid_samples)
    tbl = basis.tables(pts, K, domain)
    hk = basis.hk_norm(K, domain.lengths)
    D = basis.dense_table(tbl, hk)  # (N, K2)
    N, K2 = D.shape
    CHUNK = 1024
    pad = (-N) % CHUNK
    if pad:
        pts = jnp.concatenate([pts, jnp.full((pad, 2), 1.0e6, pts.dtype)])
        D = jnp.concatenate([D, jnp.zeros((pad, K2), D.dtype)])
        N += pad
    NC = N // CHUNK

    a = gmm.covs[..., 0, 0]; b = gmm.covs[..., 0, 1]; c = gmm.covs[..., 1, 1]
    det = a * c - b * b
    icov = jnp.stack([c / det, -b / det, a / det], axis=-1)
    nrm = gmm.weights / (2.0 * jnp.pi * jnp.sqrt(det))
    J = gmm.means.shape[1]
    # transposed per-component scenario params: lane axis = S (well tiled)
    mx = gmm.means[..., 0].T  # (J, S)
    my = gmm.means[..., 1].T
    ia = icov[..., 0].T; ib = icov[..., 1].T; ic = icov[..., 2].T  # (J, S)
    nr = nrm.T  # (J, S)
    ptsT = pts.T  # (2, N)

    # reference result (XLA path)
    phi = jax.vmap(lambda g: target_ops.gmm_target_values(pts[: 10000], g))(gmm)
    ref = basis.coefficients_dense(phi, D[:10000], K).reshape(S, K2)

    def check(out, label):
        err = float(jnp.max(jnp.abs(out - ref)))
        sc_ = float(jnp.max(jnp.abs(ref)))
        log(f"  {label}: max abs err {err:.2e} (scale {sc_:.2e})")
        return err < 1e-4 * max(sc_, 1.0)

    def try_variant(label, fn, *args):
        t0 = time.perf_counter()
        try:
            out = fn(*args)
            out.block_until_ready()
            log(f"  {label}: compiled+ran in {time.perf_counter() - t0:.1f}s")
            return out
        except Exception as e:
            msg = repr(e)
            if "Scoped allocation" in msg:
                i = msg.find("Scoped allocation")
                msg = msg[i : i + 80]
            log(f"  {label}: FAILED {msg[:300]}")
            return None

    # ---- variant A: current lib kernel (tile, J, ...) blocks, pts (N,2) ----
    from ergodic_exploration_tpu.ops.pallas_kernels import phik_from_gmm_pallas

    for tile in (8, 64, 256):
        out = try_variant(
            f"A tile={tile}",
            functools.partial(phik_from_gmm_pallas, tile=tile),
            gmm.means, gmm.covs, gmm.weights,
            pts[:10000], D[:10000],
        )
        if out is not None:
            check(out, f"A tile={tile}")
            f = jax.jit(functools.partial(phik_from_gmm_pallas, tile=tile))
            def chain(m):
                o = f(m, gmm.covs, gmm.weights, pts[:10000], D[:10000])
                return o.sum() * 0.0 + m, o
            cj = jax.jit(chain)
            sec = time_chained(cj, (gmm.means,), iters=20)
            log(f"  A tile={tile}: {sec * 1e3:.2f} ms")

    # ---- variant B: transposed layout — scenario axis on lanes ----
    # blocks: params (J, TS) lanes=TS; pts (2, CHUNK) lanes=CHUNK;
    # D (CHUNK, K2); out (TS, K2); phi computed as (CHUNK, TS) then dot
    # (K2, CHUNK) x (CHUNK, TS)? -> keep acc (TS, K2): dot(phi_T, d) with
    # phi_T (TS, CHUNK) via transpose inside kernel.
    def kernel_b(mx_r, my_r, ia_r, ib_r, ic_r, nr_r, pts_r, d_r, out_r, acc_r, tot_r):
        TS = out_r.shape[0]
        j = pl.program_id(1)
        nprog = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            acc_r[:, :] = jnp.zeros_like(acc_r)
            tot_r[:, :] = jnp.zeros_like(tot_r)

        px = pts_r[0, :]  # (CHUNK,)
        py = pts_r[1, :]
        phi = jnp.zeros((TS, px.shape[0]), jnp.float32)
        for cc in range(J):
            dx = px[None, :] - mx_r[cc, :][:, None]  # (TS, CHUNK)
            dy = py[None, :] - my_r[cc, :][:, None]
            q = (ia_r[cc, :][:, None] * dx * dx
                 + 2.0 * ib_r[cc, :][:, None] * dx * dy
                 + ic_r[cc, :][:, None] * dy * dy)
            phi = phi + nr_r[cc, :][:, None] * jnp.exp(-0.5 * q)
        tot_r[:, :] += jnp.sum(phi, axis=1, keepdims=True)
        acc_r[:, :] += jnp.dot(phi, d_r[:, :], preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

        @pl.when(j == nprog - 1)
        def _():
            out_r[:, :] = acc_r[:, :] / jnp.maximum(tot_r[:, :], 1e-12)

    def run_b(tile, dimsem):
        grid = (S // tile, NC)
        params = dict(
            grid=grid,
            in_specs=[
                pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((J, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, CHUNK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, K2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, K2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, K2), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile, K2), jnp.float32),
                pltpu.VMEM((tile, 1), jnp.float32),
            ],
        )
        if dimsem:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
        return pl.pallas_call(kernel_b, **params)(mx, my, ia, ib, ic, nr, ptsT, D)

    for tile, dimsem in ((256, False), (256, True), (512, True), (128, True)):
        out = try_variant(f"B tile={tile} dimsem={dimsem}",
                          functools.partial(run_b, tile, dimsem))
        if out is not None:
            if check(out, f"B tile={tile}"):
                fb = jax.jit(functools.partial(run_b, tile, dimsem))
                def chainb(m):
                    o = fb()
                    return o.sum() * 0.0 + m, o
                # chain dependency is artificial here (inputs are closed
                # over); measure throughput by repeated dependent sums
                cj = jax.jit(lambda m: (run_b(tile, dimsem).sum() * 0.0 + m,))
                sec = time_chained(cj, (jnp.zeros(()),), iters=20, carry_index=0)
                log(f"  B tile={tile} dimsem={dimsem}: {sec * 1e3:.2f} ms")

    log("DONE")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dispatch-free chained bench: flat-plane Schur update kernel
(ops/schur_planes.py) vs the [nn, N, B] kernel at matched (level, U)
configs, N=256 B=1024 f32. Attribution for the end-to-end flat A/B
(probe_flat_ab.py)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rslqr_tpu.ops.schur_pallas import schur_update_level_em
from rslqr_tpu.ops.schur_planes import schur_update_level_flat

N, B, n, m = 256, 1024, 6, 3
nn, mn = n * n, m * n
depth = 8
R = N * B // 128
rb = B // 128


def timeit(fn, args, K=8, reps=3, label=""):
    f1 = jax.jit(functools.partial(fn, 1))
    fK = jax.jit(functools.partial(fn, K))
    float(f1(*args)); float(fK(*args))
    t1s, tKs = [], []
    for _ in range(reps):
        t0 = time.time(); float(f1(*args)); t1s.append(time.time() - t0)
        t0 = time.time(); float(fK(*args)); tKs.append(time.time() - t0)
    per = (sorted(tKs)[1] - sorted(t1s)[1]) / (K - 1)
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per


def bench_level(level):
    U = depth - 1 - level
    key = jax.random.PRNGKey(level)
    ks = jax.random.split(key, 8)
    span = 1 << (level + 1)
    G = N // span

    mkf = lambda k, e: jax.random.normal(k, (e, R, 128), jnp.float32)
    FLl, FLx = mkf(ks[0], nn), mkf(ks[1], nn)
    FLu = mkf(ks[2], mn)
    Fls = [mkf(jax.random.fold_in(ks[3], u), nn) for u in range(U)]
    Fxs = [mkf(jax.random.fold_in(ks[4], u), nn) for u in range(U)]
    Fus = [mkf(jax.random.fold_in(ks[5], u), mn) for u in range(U)]
    fs = [
        jax.random.normal(
            jax.random.fold_in(ks[6], u), (nn, G * rb, 128), jnp.float32
        )
        for u in range(U)
    ]
    slab_bytes = (2 * nn + mn) * N * B * 4
    traffic = slab_bytes + 2 * U * slab_bytes

    def flat_chain(K, FLl, *rest):
        args = (FLl,) + rest

        # Carry the DONATED slabs through the loop (outputs feed the next
        # iteration's inputs) — carrying only FLl forces XLA to copy every
        # donated upper slab each iteration, doubling traffic (the round-4
        # probe_pairkernel artifact behind the bogus 0.44 TF/s diagnosis).
        def body(i, c):
            fls, fxs, fus = c
            ol, ox, ou, S = schur_update_level_flat(
                FLl, args[1], args[2],
                list(fls), list(fxs), list(fus),
                list(args[3 + 3 * U : 3 + 4 * U]),
                None, None,
                level=level, n=n, m=m, N=N,
            )
            return (ol, ox, ou)

        init = (
            tuple(args[3 : 3 + U]),
            tuple(args[3 + U : 3 + 2 * U]),
            tuple(args[3 + 2 * U : 3 + 3 * U]),
        )
        out = jax.lax.fori_loop(0, K, body, init)
        return jnp.sum(out[0][0][0, :1, :1])

    t = timeit(
        flat_chain, (FLl, FLx, FLu, *Fls, *Fxs, *Fus, *fs),
        label=f"flat  L={level} (U={U}) no-emit",
    )
    print(f"  -> {traffic/t/1e9:.0f} GB/s", flush=True)

    # Matched [nn, N, B] kernel (no emission for apples-to-apples).
    mko = lambda x: x.reshape(x.shape[0], N, B)
    fso = [jnp.moveaxis(f.reshape(nn, G, B), 0, 1) for f in fs]

    Flso = [mko(x) for x in Fls]
    Fxso = [mko(x) for x in Fxs]
    Fuso = [mko(x) for x in Fus]

    def old_chain(K, FLl, *rest):
        args = (FLl,) + rest

        def body(i, c):
            fls, fxs, fus = c
            ol, ox, ou, S = schur_update_level_em(
                FLl, args[1], args[2],
                list(fls), list(fxs), list(fus),
                list(args[3 + 3 * U : 3 + 4 * U]),
                None, None,
                level=level, n=n, m=m,
            )
            return (ol, ox, ou)

        init = (
            tuple(args[3 : 3 + U]),
            tuple(args[3 + U : 3 + 2 * U]),
            tuple(args[3 + 2 * U : 3 + 3 * U]),
        )
        out = jax.lax.fori_loop(0, K, body, init)
        return jnp.sum(out[0][0][0, :1, :1])

    t = timeit(
        old_chain,
        (mko(FLl), mko(FLx), mko(FLu), *Flso, *Fxso, *Fuso, *fso),
        label=f"old   L={level} (U={U}) no-emit",
    )
    print(f"  -> {traffic/t/1e9:.0f} GB/s", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    if os.environ.get("PAIR"):
        bench_pair(int(os.environ.get("LEVEL", "1")))
        return
    for level in (int(os.environ.get("LEVEL", "1")),) if os.environ.get(
        "LEVEL"
    ) else (1, 3, 5):
        bench_level(level)





def bench_pair(level=1):
    """True pair-kernel rate with a slab-carrying chain (the r4 probe's
    FLl-only carry forced donation copies)."""
    from rslqr_tpu.ops.schur_pallas import schur_update_pair_em

    U = depth - 1 - level
    key = jax.random.PRNGKey(40 + level)
    ks = jax.random.split(key, 8)
    span1, span2 = 1 << (level + 1), 1 << (level + 2)
    G1, G2 = N // span1, N // span2
    mk = lambda k, e: jax.random.normal(k, (e, N, B), jnp.float32)
    FLl, FLx, FLu = mk(ks[0], nn), mk(ks[1], nn), mk(ks[2], mn)
    Fls = [mk(jax.random.fold_in(ks[3], u), nn) for u in range(U)]
    Fxs = [mk(jax.random.fold_in(ks[4], u), nn) for u in range(U)]
    Fus = [mk(jax.random.fold_in(ks[5], u), mn) for u in range(U)]
    f1 = [
        jax.random.normal(
            jax.random.fold_in(ks[6], u), (G1, nn, B), jnp.float32
        )
        for u in range(U)
    ]
    f2 = [
        jax.random.normal(
            jax.random.fold_in(ks[7], u), (G2, nn, B), jnp.float32
        )
        for u in range(U - 1)
    ]
    Sbar2 = jax.random.normal(ks[0], (G2, nn, B), jnp.float32)
    slab_bytes = (2 * nn + mn) * N * B * 4
    traffic = slab_bytes + 2 * U * slab_bytes

    def pair_chain(K, FLl, *rest):
        args = (FLl,) + rest

        def body(i, c):
            fls, fxs, fus = c
            ol, ox, ou, S = schur_update_pair_em(
                FLl, args[1], args[2],
                list(fls), list(fxs), list(fus),
                list(args[3 + 3 * U : 3 + 4 * U]),
                args[3 + 4 * U],
                list(args[4 + 4 * U : 3 + 5 * U]),
                None, None,
                level=level, n=n, m=m,
            )
            return (ol, ox, ou)

        init = (
            tuple(args[3 : 3 + U]),
            tuple(args[3 + U : 3 + 2 * U]),
            tuple(args[3 + 2 * U : 3 + 3 * U]),
        )
        out = jax.lax.fori_loop(0, K, body, init)
        return jnp.sum(out[0][0][0, :1, :1])

    t = timeit(
        pair_chain,
        (FLl, FLx, FLu, *Fls, *Fxs, *Fus, *f1, Sbar2, *f2),
        label=f"pair  L={level} (U={U}) no-emit",
    )
    print(
        f"  -> {traffic/t/1e9:.0f} GB/s (2-level coverage: replaces "
        f"{(1 + 2 * U) + (1 + 2 * (U - 1))} single-trio passes)",
        flush=True,
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dispatch-free chained bench of the PAIR kernel alone (level 1, N=256
B=1024 f32) vs two single-level kernels — is the slab stream at roofline?
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rslqr_tpu.ops.schur_pallas import (
    schur_update_level_em,
    schur_update_pair_em,
)

N, B, n, m = 256, 1024, 6, 3
nn, mn = n * n, m * n
depth = 8
level = 1
U = depth - 1 - level  # 6


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


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    mk = lambda k, e: jax.random.normal(k, (e, N, B), jnp.float32)
    ks = jax.random.split(key, 8)
    FLl, FLx = mk(ks[0], nn), mk(ks[1], nn)
    FLu = mk(ks[2], mn)
    Fls = [mk(jax.random.fold_in(ks[3], u), nn) for u in range(U)]
    Fxs = [mk(jax.random.fold_in(ks[4], u), nn) for u in range(U)]
    Fus = [mk(jax.random.fold_in(ks[5], u), mn) for u in range(U)]
    span1, span2 = 1 << (level + 1), 1 << (level + 2)
    G1, G2 = N // span1, N // span2
    f1 = [
        jax.random.normal(jax.random.fold_in(ks[6], u), (G1, nn, B), jnp.float32)
        for u in range(U)
    ]
    f2 = [
        jax.random.normal(jax.random.fold_in(ks[7], u), (G2, nn, B), jnp.float32)
        for u in range(U - 1)
    ]
    Sbar2 = jax.random.normal(ks[0], (G2, nn, B), jnp.float32)
    G3 = N // (2 * span2)
    Asep3 = jax.random.normal(ks[1], (G3, nn, B), jnp.float32)
    Bsep3 = jax.random.normal(ks[2], (G3, mn, B), jnp.float32)
    G2e = N // (2 * span1)  # single-kernel emission groups (level+1 seps)
    Asep2 = jax.random.normal(ks[1], (G2e, nn, B), jnp.float32)
    Bsep2 = jax.random.normal(ks[2], (G2e, mn, B), jnp.float32)

    slab_bytes = (2 * nn + mn) * N * B * 4

    def pair_chain(K, FLl, *rest):
        args = (FLl,) + rest

        def body(i, c):
            FLl_, FLx_, FLu_ = c[0], args[1], args[2]
            ol, ox, ou, S = schur_update_pair_em(
                FLl_, FLx_, FLu_,
                list(args[3 : 3 + U]),
                list(args[3 + U : 3 + 2 * U]),
                list(args[3 + 2 * U : 3 + 3 * U]),
                list(args[3 + 3 * U : 3 + 4 * U]),
                args[3 + 4 * U],
                list(args[4 + 4 * U : 3 + 5 * U]),
                args[3 + 5 * U], args[4 + 5 * U],
                level=level, n=n, m=m,
            )
            return (FLl_ + ol[0][0, 0, 0] * 1e-38,)

        out = jax.lax.fori_loop(0, K, body, (FLl,))
        return jnp.sum(out[0][0, :1, :1])

    flat = (FLl, FLx, FLu, *Fls, *Fxs, *Fus, *f1, Sbar2, *f2, Asep3, Bsep3)
    t = timeit(pair_chain, flat, label="pair_kernel L=1 (U=6)")
    traffic = slab_bytes + 2 * U * slab_bytes  # mult read + upper r/w
    print(f"  -> {traffic/t/1e9:.0f} GB/s vs ~760 roofline", flush=True)

    def single_chain(K, FLl, *rest):
        args = (FLl,) + rest

        def body(i, c):
            ol, ox, ou, S = schur_update_level_em(
                c[0], args[1], args[2],
                list(args[3 : 3 + U]),
                list(args[3 + U : 3 + 2 * U]),
                list(args[3 + 2 * U : 3 + 3 * U]),
                list(args[3 + 3 * U : 3 + 4 * U]),
                args[3 + 5 * U], args[4 + 5 * U],
                level=level, n=n, m=m,
            )
            return (c[0] + ol[0][0, 0, 0] * 1e-38,)

        out = jax.lax.fori_loop(0, K, body, (FLl,))
        return jnp.sum(out[0][0, :1, :1])

    flat_s = (FLl, FLx, FLu, *Fls, *Fxs, *Fus, *f1, Sbar2, *f2, Asep2, Bsep2)
    t = timeit(single_chain, flat_s, label="single_kernel L=1 (U=6)")
    print(f"  -> {traffic/t/1e9:.0f} GB/s (same traffic model)", flush=True)


if __name__ == "__main__":
    main()

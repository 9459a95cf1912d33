#!/usr/bin/env python
"""Microbench: planes LU/chol kernel rates at the quadruped combine shape.

Chained finite-difference timing of plu_solve_multi (the scan combine's
solve), pchol + pcho_solve (the gains path), at [n=36|12, planes] shapes.
Arrays are passed as jit args (closed-over constants exceed the remote
compile helper's request limit).
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rslqr_tpu.ops.planes_pallas import pchol, pcho_solve, plu_solve_multi

P1, P2 = 256, 128  # half the quadruped chunk plane (L2=256 at level 0)


def timeit(fn, args, K=6, reps=3):
    f1 = jax.jit(functools.partial(fn, 1))
    fK = jax.jit(functools.partial(fn, K))
    float(f1(*args)); float(fK(*args))
    t1s, tKs = [], []
    for _ in range(reps):
        t0 = time.time(); float(f1(*args)); t1s.append(time.time() - t0)
        t0 = time.time(); float(fK(*args)); tKs.append(time.time() - t0)
    return (sorted(tKs)[1] - sorted(t1s)[1]) / (K - 1)


def lu_run(Kc, A, Bm, bv):
    def body(i, c):
        o = plu_solve_multi(A, c[0], c[1], c[2], c[3])
        return (o[0] * 1e-2, o[1], o[2], o[3])

    out = jax.lax.fori_loop(0, Kc, body, (Bm, bv, Bm * 2, bv * 2))
    return jnp.sum(out[0][0, 0])


def chol_run(Kc, spd):
    def body(i, c):
        return pchol(spd + c * 1e-20)

    return jnp.sum(jax.lax.fori_loop(0, Kc, body, spd)[0, 0])


def cs_run(Kc, spd, Bm):
    def body(i, c):
        return pcho_solve(spd, c)

    return jnp.sum(jax.lax.fori_loop(0, Kc, body, Bm)[0, 0])


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    F = P1 * P2

    for n in (36, 12):
        eye = jnp.eye(n, dtype=jnp.float32).reshape(n, n, 1, 1)
        A = 0.1 * jax.random.normal(key, (n, n, P1, P2), jnp.float32) + eye
        Bm = jax.random.normal(key, (n, n, P1, P2), jnp.float32)
        bv = jax.random.normal(key, (n, 1, P1, P2), jnp.float32)

        t = timeit(lu_run, (A, Bm, bv))
        wtot = 2 * n + 2
        flops = (2 * n**3 // 3 + 2 * n * n * wtot) * F
        print(
            f"plu_multi n={n} rhs={wtot}: {t*1e3:.2f} ms -> "
            f"{flops/t/1e12:.2f} TF/s", flush=True,
        )

        spd = A + jnp.swapaxes(A, 0, 1) + 2 * eye
        t = timeit(chol_run, (spd,))
        flops = n**3 // 3 * 2 * F
        print(f"pchol n={n}: {t*1e3:.2f} ms -> {flops/t/1e12:.2f} TF/s",
              flush=True)

        t = timeit(cs_run, (spd, Bm))
        flops = 2 * n**3 * F
        print(f"pcho_solve n={n} w={n}: {t*1e3:.2f} ms -> "
              f"{flops/t/1e12:.2f} TF/s", flush=True)


if __name__ == "__main__":
    main()

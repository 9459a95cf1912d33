#!/usr/bin/env python
"""On-chip probe: what does XLA TPU do with batched 36x36 linear algebra?

Times the primitive operations the quadruped config (nx=36, nu=12) is built
from, isolated from the solver structure, to attribute the pathological
throughput (BENCH r3: rslqr_quadruped 69/s, pscan_quadruped ~24/s).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, *args, flops=0, reps=3):
    f = jax.jit(fn)
    t0 = time.time()
    float(jnp.sum(f(*args)))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(f(*args)))
        ts.append(time.time() - t0)
    t = min(ts)
    gf = flops / t / 1e9 if flops else 0.0
    log(f"[probe] {name}: {t*1e3:8.2f} ms  ({gf:,.0f} GFLOP/s)  compile {compile_s:.1f}s")
    return t


def main():
    B = int(os.environ.get("PB_B", "8192"))
    n = int(os.environ.get("PB_N", "36"))
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (B, n, n), jnp.float32)
    C = jax.random.normal(k2, (B, n, n), jnp.float32)
    spd = jnp.einsum("bij,bkj->bik", A, A) + 10.0 * jnp.eye(n)
    jax.block_until_ready((A, C, spd))
    gemm_flops = 2 * B * n * n * n
    log(f"[probe] backend={jax.default_backend()} B={B} n={n}")

    for prec in ("highest", "default"):
        with jax.default_matmul_precision(prec):
            timeit(
                f"batched gemm [{B},{n},{n}] prec={prec}",
                lambda a, b: a @ b, A, C, flops=gemm_flops,
            )
    # K-chained gemm (removes dispatch): 16 dependent matmuls.
    def chain(a, b):
        def body(i, x):
            return (x @ b) * 1e-2
        return jax.lax.fori_loop(0, 16, body, a)
    with jax.default_matmul_precision("highest"):
        timeit(f"chained 16x gemm prec=highest", chain, A, C,
               flops=16 * gemm_flops)
    with jax.default_matmul_precision("default"):
        timeit(f"chained 16x gemm prec=default", chain, A, C,
               flops=16 * gemm_flops)

    # Padded to 48 and 64 (tile-friendlier).
    for npad in (48, 64, 128):
        Ap = jnp.pad(A, ((0, 0), (0, npad - n), (0, npad - n)))
        Cp = jnp.pad(C, ((0, 0), (0, npad - n), (0, npad - n)))
        jax.block_until_ready((Ap, Cp))
        with jax.default_matmul_precision("highest"):
            timeit(
                f"batched gemm padded [{B},{npad},{npad}]",
                lambda a, b: a @ b, Ap, Cp,
                flops=2 * B * npad ** 3,
            )

    timeit(f"batched cholesky [{B},{n},{n}]", jnp.linalg.cholesky, spd,
           flops=B * n ** 3 // 3)
    L = jnp.linalg.cholesky(spd)
    jax.block_until_ready(L)
    timeit(
        f"batched triangular_solve [{B},{n},{n}]",
        lambda l, c: jax.lax.linalg.triangular_solve(
            l, c, left_side=True, lower=True
        ),
        L, C, flops=B * n ** 3,
    )
    timeit(f"batched LU solve [{B},{n},{n}]",
           lambda s, c: jnp.linalg.solve(s, c), spd, C,
           flops=2 * B * n ** 3)
    # Elementwise baseline: pure HBM bandwidth sanity check.
    bytes_ = 3 * B * n * n * 4
    t = timeit(f"elementwise add [{B},{n},{n}]", lambda a, b: a + b, A, C)
    log(f"[probe] elementwise implies {bytes_/t/1e9:.0f} GB/s effective")


def chained_probe():
    """Chained (dispatch-free) timings of the decomposition primitives."""
    B = int(os.environ.get("PB_B", "8192"))
    n = int(os.environ.get("PB_N", "36"))
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, n, n), jnp.float32)
    spd = jnp.einsum("bij,bkj->bik", A, A) + 10.0 * jnp.eye(n)
    L0 = jnp.linalg.cholesky(spd)
    jax.block_until_ready((A, spd, L0))
    K = 8

    def chain(op):
        def run(x):
            def body(i, c):
                return op(c) * 1.0
            return jax.lax.fori_loop(0, K, body, x)
        return run

    t1 = timeit("chained 8x cholesky", chain(
                lambda c: jnp.linalg.cholesky(
                    jnp.einsum("bij,bkj->bik", c, c) + 10.0 * jnp.eye(n))),
                spd, flops=K * B * (n ** 3 // 3 + 2 * n ** 3))
    t2 = timeit("chained 8x trsm", chain(
                lambda c: jax.lax.linalg.triangular_solve(
                    L0, c, left_side=True, lower=True)),
                A, flops=K * B * n ** 3)
    t3 = timeit("chained 8x LU-solve", chain(
                lambda c: jnp.linalg.solve(spd + 0.0, c)),
                A, flops=K * 2 * B * n ** 3)
    t4 = timeit("chained 8x gemm-pair (baseline)", chain(
                lambda c: jnp.einsum("bij,bkj->bik", c, c) / 10.0),
                A, flops=K * 2 * B * n ** 3)
    log(f"[probe] net per-op ms: chol-ish {(t1)*1e3/K:.2f} trsm {(t2)*1e3/K:.2f} "
        f"lu {(t3)*1e3/K:.2f} gemm {(t4)*1e3/K:.2f}")


if __name__ == "__main__":
    if os.environ.get("PB_CHAIN"):
        chained_probe()
    else:
        main()

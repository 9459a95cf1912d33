#!/usr/bin/env python
"""Microbenchmark: achieved HBM bandwidth of the Pallas Schur kernel.

For each tree level, chains K data-dependent kernel invocations (outputs
feed the next call's upper slabs) and reports ms/call and achieved GB/s
against the per-call traffic model (FL read + upper slabs r/w + fsol read
+ S-emission writes). Run on the real chip:

    python bench_kernels.py            # N=256 B=1024 n=6 m=3
Env: KB_LEVELS ("0,2,4,6"), KB_N, KB_B, KB_K (8), KB_REPS (3).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from rslqr_tpu.ops.schur_pallas import schur_update_level_em


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    N = int(os.environ.get("KB_N", "256"))
    B = int(os.environ.get("KB_B", "1024"))
    K = int(os.environ.get("KB_K", "8"))
    reps = int(os.environ.get("KB_REPS", "3"))
    levels = [int(x) for x in os.environ.get("KB_LEVELS", "0,2,4,6").split(",")]
    n, m = 6, 3
    nn, mn = n * n, m * n
    depth = (N - 1).bit_length()

    for level in levels:
        U = depth - level - 1
        if U < 1:
            continue
        span = 1 << (level + 1)
        G = N // span
        key = jax.random.PRNGKey(level)
        ks = jax.random.split(key, 7)
        FLl = jax.random.normal(ks[0], (nn, N, B), jnp.float32)
        FLx = jax.random.normal(ks[1], (nn, N, B), jnp.float32)
        FLu = jax.random.normal(ks[2], (mn, N, B), jnp.float32)
        Fls = [jax.random.normal(ks[3], (nn, N, B), jnp.float32)] * U
        Fxs = [jax.random.normal(ks[4], (nn, N, B), jnp.float32)] * U
        Fus = [jax.random.normal(ks[5], (mn, N, B), jnp.float32)] * U
        fsol = [jax.random.normal(ks[6], (G, nn, B), jnp.float32)] * U
        # Next-level separator dynamics: exercises the production S-emission
        # configuration when the tile covers whole next-level groups.
        span2 = 2 * span
        emit_cfg = span2 <= min(max(span, 8) * 2, 16, N) and N >= span2
        if emit_cfg:
            G2 = N // span2
            Asep = jax.random.normal(ks[0], (G2, nn, B), jnp.float32)
            Bsep = jax.random.normal(ks[1], (G2, n * m, B), jnp.float32)
        else:
            Asep = Bsep = None

        def chained(Kc):
            def run(args):
                fls, fxs, fus = args

                def body(i, carry):
                    fls, fxs, fus = carry
                    ol, ox, ou, _ = schur_update_level_em(
                        FLl, FLx, FLu, list(fls), list(fxs), list(fus),
                        fsol, Asep, Bsep, level=level, n=n, m=m,
                    )
                    return (ol, ox, ou)

                fls, fxs, fus = jax.lax.fori_loop(
                    0, Kc, body, (tuple(fls), tuple(fxs), tuple(fus))
                )
                return sum(jnp.sum(x[0]) for x in (fls, fxs, fus))

            return jax.jit(run)

        f1, fK = chained(1), chained(K)
        args = (tuple(Fls), tuple(Fxs), tuple(Fus))
        t0 = time.time()
        float(f1(args))
        log(f"[kb] level {level}: compile+first {time.time() - t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.time(); float(f1(args)); t1 = time.time() - t0
            t0 = time.time(); float(fK(args)); tK = time.time() - t0
            ts.append((tK - t1) / (K - 1))
        per_call = min(ts)
        slab = (2 * nn + mn) * N * B * 4
        # S emission replaced the 4 extracts in round 3: one [G2, nn, B]
        # array per upper level when the tile covers next-level groups.
        emit = 2 * span <= min(max(2 * span, 8), 16, N)
        ex_bytes = nn * (N // (2 * span)) * B * 4 if emit else 0
        traffic = slab + U * (2 * slab + ex_bytes) + U * (G * nn * B * 4)
        print(
            json.dumps(
                {
                    "level": level,
                    "U": U,
                    "ms_per_call": round(per_call * 1e3, 2),
                    "model_GB": round(traffic / 1e9, 2),
                    "achieved_GBps": round(traffic / per_call / 1e9, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the batched interior recovery (pscan_batched_interior) on chip.

Quadruped config (N=512 nx=36 nu=12), one 128-scenario chunk (the bench's
per-chunk unit). Hoist-proof Qdiag-perturbed chains, finite-difference
K=1 vs K=3. Variants: (chunk, batched) pairs from PROBE_VARIANTS, default
"32:0,32:1,16:1" — flag off at the round-5 measured-best s=32, then the
batched recovery at s=32 and s=16 (batching shifts the serial/parallel
tradeoff, so the best s may move).
"""

import dataclasses
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import rslqr_tpu as rt
from rslqr_tpu import pscan
from rslqr_tpu.config import SolveOptions


def fd(make, batch, K1=1, K2=3, reps=3):
    f1 = jax.jit(functools.partial(make, K1))
    f2 = jax.jit(functools.partial(make, K2))
    t0 = time.time()
    float(f1(batch))
    print(f"  compile+first K1: {time.time()-t0:.1f} s", flush=True)
    t0 = time.time()
    float(f2(batch))
    print(f"  compile+first K2: {time.time()-t0:.1f} s", flush=True)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.time(); float(f1(batch)); t1s.append(time.time() - t0)
        t0 = time.time(); float(f2(batch)); t2s.append(time.time() - t0)
    t1, t2 = sorted(t1s)[len(t1s) // 2], sorted(t2s)[len(t2s) // 2]
    print(f"  K1 med {t1*1e3:.1f} ms (all {[f'{t*1e3:.0f}' for t in t1s]})",
          flush=True)
    print(f"  K2 med {t2*1e3:.1f} ms (all {[f'{t*1e3:.0f}' for t in t2s]})",
          flush=True)
    return (t2 - t1) / (K2 - K1)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    Bq = int(os.environ.get("PROBE_BATCH", "128"))
    print(f"batch={Bq}", flush=True)
    prob = rt.random_problem(jax.random.PRNGKey(1), 512, 36, 12, jnp.float32)
    batch = rt.batch_problems(
        prob, jax.random.split(jax.random.PRNGKey(0), Bq)
    )
    jax.block_until_ready(batch)

    variants = [
        tuple(int(x) for x in v.split(":"))
        for v in os.environ.get("PROBE_VARIANTS", "32:0,32:1,16:1").split(",")
    ]
    for s, bi in variants:
        opts = SolveOptions(pscan_chunk=s, pscan_batched_interior=bool(bi))

        def chain(K, b, opts=opts):
            def body(i, c):
                p2 = dataclasses.replace(b, Qdiag=b.Qdiag + c[0])
                out = pscan.solve_pscan_kkt(p2, options=opts)
                ss = jnp.sum(out[..., :1])
                return (ss * jnp.asarray(1e-38, ss.dtype), c[1] + ss)

            z = jnp.asarray(0.0, jnp.float32)
            return jax.lax.fori_loop(0, K, body, (z, z))[1]

        print(f"chunk={s} batched_interior={bool(bi)}:", flush=True)
        t = fd(chain, batch)
        print(
            f"chunk={s} batched_interior={bool(bi)}: {t*1e3:.1f} ms/"
            f"{Bq}-chunk -> {Bq/t:.0f} solves/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

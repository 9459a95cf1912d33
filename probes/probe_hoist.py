#!/usr/bin/env python
"""Does XLA hoist x0-independent solver work out of the bench's K-chain?

bench.py's chained runner perturbs x0 between iterations; the backward
scan (pscan) and the whole factorization (rslqr) are x0-independent, so
XLA may compute them ONCE outside the fori loop — inflating the
finite-difference throughput. Compare x0-perturbed chains against
Qdiag-perturbed chains (Qdiag feeds every stage of both solvers).
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
from rslqr_tpu import pscan, rslqr


def chained(kkt_fn, K, field):
    def run(b):
        def body(i, carry):
            eps, acc = carry
            if field == "x0":
                p2 = dataclasses.replace(b, x0=b.x0 + eps)
            else:
                p2 = dataclasses.replace(b, Qdiag=b.Qdiag + eps)
            s = jnp.sum(kkt_fn(p2))
            return (s * jnp.asarray(1e-38, s.dtype), acc + s)

        zero = jnp.asarray(0.0, b.x0.dtype)
        return jax.lax.fori_loop(0, K, body, (zero, zero))[1]

    return jax.jit(run)


def fd(kkt_fn, batch, field, K1=1, K2=7, reps=3):
    f1, f2 = chained(kkt_fn, K1, field), chained(kkt_fn, K2, field)
    float(f1(batch)); float(f2(batch))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.time(); float(f1(batch)); t1s.append(time.time() - t0)
        t0 = time.time(); float(f2(batch)); t2s.append(time.time() - t0)
    t1m, t2m = sorted(t1s)[1], sorted(t2s)[1]
    return (t2m - t1m) / (K2 - K1)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    prob, _ = rt.read_lqr_problem_json(
        "/root/reference/lqr_prob_256.json", dtype=jnp.float32
    )
    batch = rt.batch_problems(prob, jax.random.split(jax.random.PRNGKey(0), 1024))
    jax.block_until_ready(batch)
    for name, fn in [("pscan", pscan.solve_pscan_kkt), ("rslqr", rslqr.solve_kkt)]:
        for field in ("x0", "Qdiag"):
            t = fd(fn, batch, field)
            print(
                f"{name} N=256 B=1024 perturb={field}: {t*1e3:.2f} ms/solve "
                f"-> {1024/t:,.0f} solves/s", flush=True,
            )


if __name__ == "__main__":
    main()

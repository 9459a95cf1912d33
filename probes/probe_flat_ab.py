#!/usr/bin/env python
"""A/B the flat-plane Schur kernel suite (ops/schur_planes.py) against the
[nn, N, B] suite on the N=256 nx=6 nu=3 B=1024 f32 config, hoist-proof
Qdiag-perturbed chains (bench.py method). Run on the real chip.

Env: FLAT=0|1 (default both), K1/K2 chain lengths, REPS.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import rslqr_tpu as rt
from rslqr_tpu import rslqr_em
from rslqr_tpu.config import SolveOptions

log = lambda m: print(m, file=sys.stderr, flush=True)


def chained(kkt_fn, K):
    def run(b):
        def body(i, carry):
            eps, acc = carry
            p2 = dataclasses.replace(b, Qdiag=b.Qdiag + eps)
            s = jnp.sum(kkt_fn(p2))
            return (s * jnp.asarray(1e-38, s.dtype), acc + s)

        zero = jnp.asarray(0.0, b.x0.dtype)
        return jax.lax.fori_loop(0, K, body, (zero, zero))[1]

    return jax.jit(run)


def time_fn(fn, batch, reps, label):
    t0 = time.time()
    float(fn(batch))
    log(f"[{label}] compile+first={time.time()-t0:.1f}s")
    float(fn(batch))  # warmup
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(batch))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"[{label}] median {med*1e3:.1f}ms reps={[round(t*1e3,1) for t in ts]}")
    return med


def main():
    B = int(os.environ.get("BB", "1024"))
    N = int(os.environ.get("NN", "256"))
    k1 = int(os.environ.get("K1", "1"))
    k2 = int(os.environ.get("K2", "9"))
    reps = int(os.environ.get("REPS", "5"))
    prob, _ = rt.read_lqr_problem_json(
        "/root/reference/lqr_prob_256.json", dtype=jnp.float32
    )
    batch = rt.batch_problems(prob, jax.random.split(jax.random.PRNGKey(0), B))
    jax.block_until_ready(batch)
    log(f"device={jax.devices()[0]} B={B} N={N}")

    which = os.environ.get("FLAT", "both")
    variants = []
    if which in ("both", "1"):
        variants.append(("flat", SolveOptions(flat_planes=True)))
    if which in ("both", "0"):
        variants.append(("old", SolveOptions(flat_planes=False)))
    for name, opts in variants:
        fn = lambda p, o=opts: rslqr_em.solve_kkt_em(p, options=o)
        t1 = time_fn(chained(fn, k1), batch, reps, f"{name} K={k1}")
        t2 = time_fn(chained(fn, k2), batch, reps, f"{name} K={k2}")
        per = (t2 - t1) / (k2 - k1)
        log(
            f"[{name}] per-solve {per*1e3:.2f} ms -> {B/per:,.0f} solves/s"
            f" (t{k2}/{k2} = {t2/k2*1e3:.2f} ms)"
        )


if __name__ == "__main__":
    main()

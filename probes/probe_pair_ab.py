#!/usr/bin/env python
"""A/B the level-paired factor sweep on chip (N=256 nx=6 B=1024 f32).

Times factorize_em alone and the full solve with level_pairing on/off,
Qdiag-perturbed chains (hoist-proof).
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
from rslqr_tpu import rslqr_em
from rslqr_tpu.config import SolveOptions


def fd(make, batch, K1=1, K2=9, reps=3):
    f1, f2 = jax.jit(functools.partial(make, K1)), jax.jit(
        functools.partial(make, K2)
    )
    float(f1(batch)); float(f2(batch))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.time(); float(f1(batch)); t1s.append(time.time() - t0)
        t0 = time.time(); float(f2(batch)); t2s.append(time.time() - t0)
    return (sorted(t2s)[1] - sorted(t1s)[1]) / (K2 - K1)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    prob, _ = rt.read_lqr_problem_json(
        "/root/reference/lqr_prob_256.json", dtype=jnp.float32
    )
    batch = rt.batch_problems(
        prob, jax.random.split(jax.random.PRNGKey(0), 1024)
    )
    jax.block_until_ready(batch)

    for pair in (True, False):
        opts = SolveOptions(level_pairing=pair)

        def fact_chain(K, b, opts=opts):
            def body(i, c):
                p2 = dataclasses.replace(b, Qdiag=b.Qdiag + c[0])
                fact, rhs = rslqr_em.factorize_em(p2, options=opts)
                s = jnp.sum(fact.chols[-1][..., :1]) + jnp.sum(rhs[0][0, 0, :1])
                return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

            z = jnp.asarray(0.0, jnp.float32)
            return jax.lax.fori_loop(0, K, body, (z, z))[1]

        t = fd(fact_chain, batch)
        print(f"factorize_em pair={pair}: {t*1e3:.2f} ms", flush=True)

        def solve_chain(K, b, opts=opts):
            def body(i, c):
                p2 = dataclasses.replace(b, Qdiag=b.Qdiag + c[0])
                out = rslqr_em.solve_kkt_em(p2, options=opts)
                s = jnp.sum(out[..., :1])
                return (s * jnp.asarray(1e-38, s.dtype), c[1] + s)

            z = jnp.asarray(0.0, jnp.float32)
            return jax.lax.fori_loop(0, K, body, (z, z))[1]

        t = fd(solve_chain, batch)
        print(f"solve_em     pair={pair}: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

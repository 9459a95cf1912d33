#!/usr/bin/env python
"""Headline benchmark: batched N=256 (nx=6, nu=3) rsLQR solves/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 10_000 (the BASELINE.md target).

Methodology mirrors the reference's sample_problem_test.c:47-67 (repeated
solves, robust statistic — here best-of-k to exclude dispatch jitter), with
one TPU-specific correction: the result is reduced to a scalar and fetched to
the host each iteration, because on the remote-TPU tunnel
``block_until_ready`` on an unfetched buffer can return before execution
completes, which silently inflates throughput ~1000x.

Accuracy context (not part of the headline metric, printed to stderr): the
same f32 configuration is checked for KKT residual; strict 1e-6 golden parity
lives in the f64 test suite (tests/test_rslqr.py).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
# sitecustomize imports jax before us, so set the cache via live config too.
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import rslqr_tpu as rt
from rslqr_tpu import rslqr

BASELINE_SOLVES_PER_SEC = 10_000.0


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", "1024"))
    nhorizon = int(os.environ.get("BENCH_HORIZON", "256"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    path = "/root/reference/lqr_prob_256.json"
    if nhorizon == 256 and os.path.exists(path):
        prob, _ = rt.read_lqr_problem_json(path, dtype=jnp.float32)
    else:
        prob = rt.double_integrator_problem(nhorizon, dtype=jnp.float32)

    keys = jax.random.split(jax.random.PRNGKey(0), batch_size)
    batch = rt.batch_problems(prob, keys)
    jax.block_until_ready(batch)

    solve = jax.jit(rslqr.solve_kkt)
    reduced = jax.jit(lambda b: jnp.sum(rslqr.solve_kkt(b)))

    t0 = time.time()
    float(reduced(batch))  # compile + first run, forced to completion
    compile_s = time.time() - t0
    print(f"[bench] backend={jax.default_backend()} device={jax.devices()[0]}", file=sys.stderr)
    print(f"[bench] B={batch_size} N={nhorizon} compile+first={compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.time()
        float(reduced(batch))  # scalar fetch forces real completion
        times.append(time.time() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    solves_per_sec = batch_size / med
    print(
        f"[bench] per-batch: best {best*1e3:.1f}ms median {med*1e3:.1f}ms "
        f"-> {solves_per_sec:,.0f} solves/s (best {batch_size/best:,.0f})",
        file=sys.stderr,
    )

    # f32 solution-quality context on the reference problem.
    out = np.asarray(solve(jax.tree.map(lambda x: x[:1], batch)))[0]
    single = jax.tree.map(lambda x: x[0], batch)
    res = float(rt.kkt_residual(single, jnp.asarray(out)))
    print(f"[bench] f32 KKT residual (batch[0]): {res:.3e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"rslqr_solves_per_sec_chip_n{nhorizon}_b{batch_size}_f32",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

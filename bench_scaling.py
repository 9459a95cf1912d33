#!/usr/bin/env python
"""Scaling-efficiency benchmark: fixed total batch, varying device count.

BASELINE.md target: >= 80% scaling efficiency from 1 host to >= 2 hosts.
Only one physical chip is attached in this environment, so by default this
measures the *virtual* CPU mesh (methodology + harness validation; the
numbers become meaningful on a real pod slice). Prints one JSON line per
device count plus a final efficiency summary line.

Env: SCALE_DEVICES (e.g. "1,2,4,8"), SCALE_BATCH (512), SCALE_HORIZON (256),
SCALE_MODE (dp|sp), SCALE_PLATFORM (cpu to force the virtual mesh).
"""

import json
import os
import sys
import time

if os.environ.get("SCALE_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("SCALE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import rslqr_tpu as rt
from rslqr_tpu.parallel import make_mesh, solve_batch_sharded
from rslqr_tpu.parallel.seq import solve_seq_sharded


def main():
    counts = [int(x) for x in os.environ.get("SCALE_DEVICES", "1,2,4,8").split(",")]
    B = int(os.environ.get("SCALE_BATCH", "512"))
    N = int(os.environ.get("SCALE_HORIZON", "256"))
    mode = os.environ.get("SCALE_MODE", "dp")
    reps = int(os.environ.get("SCALE_REPS", "3"))

    prob = rt.double_integrator_problem(N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batch = rt.batch_problems(prob, keys)
    jax.block_until_ready(batch)

    devices = jax.devices()
    times = {}
    for d in counts:
        if d > len(devices):
            print(f"[scale] skip {d}: only {len(devices)} devices", file=sys.stderr)
            continue
        if mode == "dp":
            mesh = make_mesh((d,), ("dp",), devices[:d])
            fn = jax.jit(lambda b: jnp.sum(solve_batch_sharded(b, mesh).kkt_vector()))
        else:
            mesh = make_mesh((1, d), ("dp", "sp"), devices[:d])
            fn = jax.jit(lambda b: jnp.sum(solve_seq_sharded(b, mesh, "sp", "dp")))
        float(fn(batch))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fn(batch))
            ts.append(time.time() - t0)
        t = min(ts)
        times[d] = t
        eff = times[counts[0]] / (t * d / counts[0]) if counts[0] in times else 1.0
        print(
            json.dumps(
                {
                    "metric": f"scaling_{mode}_d{d}_n{N}_b{B}",
                    "value": round(B / t, 1),
                    "unit": "solves/s",
                    "efficiency_vs_1dev": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()

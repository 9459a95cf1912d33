#!/usr/bin/env python
"""On-chip per-phase profiling artifact (PROFILE_r{N}.txt).

Runs profile_solve on the production config (N=256, B=1024, f32) so the
five-phase attribution describes the program BENCH times, and prints the
solve summary with the analytic model's roofline share for
model-vs-measurement comparison (VERDICT r2 item #5).

Env: PF_B (1024), PF_N (256), PF_REPS (3).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_matmul_precision", "highest")

import rslqr_tpu as rt
from rslqr_tpu import profile


def main():
    B = int(os.environ.get("PF_B", "1024"))
    N = int(os.environ.get("PF_N", "256"))
    reps = int(os.environ.get("PF_REPS", "3"))
    path = "/root/reference/lqr_prob_256.json"
    if N == 256 and os.path.exists(path):
        prob, _ = rt.read_lqr_problem_json(path, dtype=jnp.float32)
    else:
        prob = rt.double_integrator_problem(N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batch = rt.batch_problems(prob, keys)
    jax.block_until_ready(batch)
    print(f"config: N={N} B={B} f32 backend={jax.default_backend()} "
          f"device={jax.devices()[0]}", flush=True)

    p = profile.profile_solve(batch, repeats=reps)
    p.print()
    phases = (p.t_leaves_ms + p.t_products_ms + p.t_cholesky_ms
              + p.t_cholsolve_ms + p.t_shur_ms)
    print(f"phase sum (excl. RHS): {phases:.2f} ms; "
          f"RHS+overhead = total - phases = {p.t_total_ms - phases:.2f} ms",
          flush=True)
    profile.print_solve_summary(
        p.t_total_ms, problem=batch,
        backend=rt.linear_algebra_backend(), hbm_gbps=819.0,
    )
    est = profile.linalg_flop_estimate(6, 3, N)
    model_ms = est["hbm_bytes_min_f32"] * B / 819e9 * 1e3
    print(f"model: min traffic {est['hbm_bytes_min_f32']*B/1e9:.2f} GB "
          f"-> {model_ms:.2f} ms at 819 GB/s roofline; measured total "
          f"{p.t_total_ms:.2f} ms = {model_ms/p.t_total_ms*100:.0f}% of "
          f"roofline-in-model terms", flush=True)


if __name__ == "__main__":
    main()

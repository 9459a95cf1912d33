#!/usr/bin/env python
"""Microbench: planes-gemm kernel variants (register blocking / tile size).

Measures the mid-block element-plane gemm (ops/planes_pallas.py) against
row-blocked variants to find the VPU efficiency ceiling on this chip.
Chained (dispatch-free) timing: K back-to-back kernel calls with a data
dependence, finite-differenced. Also times a pure-FMA kernel (operands
pinned in registers) as the VPU peak reference.

Run on TPU: python probe_pgemm.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_BLK = 36
P1, P2 = 512, 128  # quadruped chunk: F = 512*128 planes
VMEM = 100 * 1024 * 1024


def _gemm_kernel_ib(a_ref, b_ref, o_ref, *, p, K, ib, unroll_i):
    """C[i,:] = sum_k A[i,k] * B[k,:], rows blocked by ib."""
    def body(i0, _):
        i0 = i0 * ib
        accs = [None] * ib
        for k in range(K):
            r = b_ref[k]  # [q, t1, t2]
            for d in range(ib):
                t = r * a_ref[i0 + d, k][None]
                accs[d] = t if k == 0 else accs[d] + t
        for d in range(ib):
            o_ref[i0 + d] = accs[d]
        return 0

    if unroll_i:
        for i0 in range(p // ib):
            body(i0, 0)
    else:
        jax.lax.fori_loop(0, p // ib, body, 0)


@functools.partial(jax.jit, static_argnames=("ib", "t1", "unroll_i"))
def pgemm_ib(A, B, *, ib=1, t1=8, unroll_i=False):
    p, K, P1_, P2_ = A.shape
    q = B.shape[1]
    t2 = min(128, P2_)
    spec = lambda d0, d1: pl.BlockSpec((d0, d1, t1, t2), lambda i, j: (0, 0, i, j))
    return pl.pallas_call(
        functools.partial(_gemm_kernel_ib, p=p, K=K, ib=ib, unroll_i=unroll_i),
        grid=(P1_ // t1, P2_ // t2),
        in_specs=[spec(p, K), spec(K, q)],
        out_specs=spec(p, q),
        out_shape=jax.ShapeDtypeStruct((p, q, P1_, P2_), A.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * K * q * P1_ * P2_,
            bytes_accessed=4 * P1_ * P2_ * (p * K + K * q + p * q),
            transcendentals=0,
        ),
    )(A, B)


def _fma_peak_kernel(a_ref, o_ref, *, reps):
    x = a_ref[0]
    acc = x
    for _ in range(reps):
        acc = acc * x + x
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("reps", "t1"))
def fma_peak(A, *, reps, t1=8):
    _, P1_, P2_ = A.shape
    t2 = 128
    spec = pl.BlockSpec((1, t1, t2), lambda i, j: (0, i, j))
    return pl.pallas_call(
        functools.partial(_fma_peak_kernel, reps=reps),
        grid=(P1_ // t1, P2_ // t2),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(A)


def chain_time(fn, args, K=8):
    """Finite-difference chained timing: t(K) - t(1)."""

    def chained(k):
        def run(args):
            out = fn(*args)
            for _ in range(k - 1):
                a0 = args[0] + out[0, 0, 0, 0] * 1e-38 if out.ndim == 4 else args[0] + out[0, 0, 0] * 1e-38
                out = fn(a0, *args[1:])
            return jnp.sum(out[..., 0, :1, :1])

        return jax.jit(run)

    f1, fK = chained(1), chained(K)
    float(f1(args)); float(fK(args))
    ts1, tsK = [], []
    for _ in range(3):
        t0 = time.time(); float(f1(args)); ts1.append(time.time() - t0)
        t0 = time.time(); float(fK(args)); tsK.append(time.time() - t0)
    t1m = sorted(ts1)[1]
    tKm = sorted(tsK)[1]
    return (tKm - t1m) / (K - 1)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    p = K_ = q = N_BLK
    A = jax.random.normal(key, (p, K_, P1, P2), jnp.float32)
    B = jax.random.normal(key, (K_, q, P1, P2), jnp.float32)
    flops = 2 * p * K_ * q * P1 * P2
    traffic = 4 * P1 * P2 * (p * K_ + K_ * q + p * q)

    # VPU peak reference: reps FMAs on one in-register vreg per tile.
    reps = 4096
    X = jax.random.normal(key, (1, P1, P2), jnp.float32)
    t = chain_time(lambda a: fma_peak(a, reps=reps), (X,), K=4)
    peak = 2 * reps * P1 * P2 / t
    print(f"fma_peak: {t*1e3:.3f} ms -> {peak/1e12:.2f} TFLOP/s", flush=True)

    for t1 in (8, 16):
        for ib in (1, 2, 4):
            for unroll in (False,):
                try:
                    f = lambda a, b, ib=ib, t1=t1, u=unroll: pgemm_ib(
                        a, b, ib=ib, t1=t1, unroll_i=u
                    )
                    t = chain_time(f, (A, B), K=8)
                    print(
                        f"pgemm ib={ib} t1={t1} unroll={unroll}: "
                        f"{t*1e3:.3f} ms -> {flops/t/1e12:.3f} TF/s, "
                        f"{traffic/t/1e9:.0f} GB/s",
                        flush=True,
                    )
                except Exception as e:
                    print(f"pgemm ib={ib} t1={t1}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()

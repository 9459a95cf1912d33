#!/usr/bin/env python
"""Headline benchmark: batched N=256 (nx=6, nu=3) LQR solves/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 10_000 (the BASELINE.md target) plus a "detail" field
carrying best AND median solves/s for every solver timed (so headline claims
stay reconcilable with driver-captured artifacts). The headline value is the
MEDIAN of the fastest solver family.

Methodology mirrors the reference's sample_problem_test.c:47-67 (repeated
solves, robust statistic), with two TPU-specific corrections:

1. The result is reduced to a scalar and fetched to the host to force real
   completion, because on the remote-TPU tunnel ``block_until_ready`` can
   return before execution completes (silently inflates throughput ~1000x).
2. The host round trip on this tunnel costs ~25 ms — more than the solve
   itself — so each timed program runs K data-dependent chained solves
   inside one ``lax.fori_loop`` (iteration i's Qdiag is nudged by a
   denormal function of iteration i-1's output: Qdiag feeds EVERY stage,
   so XLA cannot hoist loop-invariant solver work — see _chained), and
   the per-solve time is the finite difference (t(K2) - t(K1)) / (K2 - K1).
   This measures steady-state device throughput, which is what batched
   production serving sees.

One run covers every headline family: pscan/rslqr/refine on the N=256
nx=6 config plus rslqr/pscan on the quadruped (N=512, nx=36) config, all
reported in the JSON ``detail`` with mean/std/min/median/max solves/s (the
reference's kNruns statistics, sample_problem_test.c:47-67) and the
compile+first latency per program.

Env knobs: BENCH_BATCH (1024), BENCH_HORIZON (256), BENCH_REPS (5),
BENCH_SOLVER (comma list of pscan|rslqr|rslqr_grid|rslqr_em|refine, "all" =
pscan+rslqr+refine+quadruped, "both" = pscan+rslqr only), BENCH_K1/BENCH_K2
(1/9), BENCH_CONFIG=quadruped (quadruped only), BENCH_QUAD_BATCH (256),
BENCH_QUAD_HORIZON (512), BENCH_QUAD_CHUNK (32).
"""

import dataclasses
import functools
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
from rslqr_tpu import pscan, refine, rslqr, rslqr_em

if os.environ.get("BENCH_FACTOR_DTYPE"):
    # bf16 factor-slab storage experiment (config.factor_dtype, STATUS.md).
    from rslqr_tpu.config import config as _cfg

    _cfg.factor_dtype = os.environ["BENCH_FACTOR_DTYPE"]

BASELINE_SOLVES_PER_SEC = 10_000.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _grid_kkt(p):
    """Force the knot-major grid layout (A/B comparison path)."""
    from rslqr_tpu.config import config

    old = config.layout
    config.layout = "grid"  # trace-time switch
    try:
        return rslqr.solve_kkt(p)
    finally:
        config.layout = old


def _refine_kkt(p):
    sol = refine.solve_refined(p, iterations=2, solve_dtype=jnp.float32)
    return sol.kkt_vector()


SOLVERS = {
    "pscan": pscan.solve_pscan_kkt,
    "rslqr": rslqr.solve_kkt,  # layout auto-dispatch (em small / grid MXU)
    "rslqr_em": rslqr_em.solve_kkt_em,
    "rslqr_grid": _grid_kkt,
    "refine": _refine_kkt,
}


def _chunked(kkt_fn, chunk):
    """Process the scenario batch in sequential chunks via lax.map — the
    quadruped-scale configs (nx=36) exceed one chip's HBM as a single
    batched program; chunking trades concurrency for residency."""

    def run(b):
        B = b.x0.shape[0]
        if B <= chunk or B % chunk:
            return kkt_fn(b)
        parts = jax.tree.map(
            lambda x: x.reshape((B // chunk, chunk) + x.shape[1:]), b
        )
        outs = jax.lax.map(kkt_fn, parts)
        return outs.reshape((B,) + outs.shape[2:])

    return run


def _chained(kkt_fn, K):
    """Jitted runner of K sequentially-dependent solves (see module doc).

    The dependence is injected through ``Qdiag`` (NOT x0): every stage of
    every solver family reads Qdiag, so nothing is loop-invariant. An
    earlier x0-only injection let XLA hoist the x0-independent work out of
    the chain — the whole backward value scan for the pscan family
    (measured 2.0x inflation at N=256: 298.6k vs the honest 150.3k
    solves/s) and in principle the entire rsLQR factorization (measured
    unaffected there: 13.77 vs 13.74 ms). Probe: probe_hoist.py.
    """

    def run(b):
        def body(i, carry):
            eps, acc = carry
            p2 = dataclasses.replace(b, Qdiag=b.Qdiag + eps)
            s = jnp.sum(kkt_fn(p2))
            # ~1e-38 * O(1e3) is denormal noise: forces the data dependence
            # without perturbing Qdiag at float32 resolution.
            return (s * jnp.asarray(1e-38, s.dtype), acc + s)

        zero = jnp.asarray(0.0, b.x0.dtype)
        return jax.lax.fori_loop(0, K, body, (zero, zero))[1]

    return jax.jit(run)


def _time_stats(fn, batch, reps, label, warmup=1):
    """Run ``fn`` reps times; returns (per-rep seconds, compile seconds).

    One warm-up run (discarded) follows compile+first: the first
    post-compile execution on this tunnel is occasionally 3x slow
    (BENCH_r03 pscan min 88.5k vs median 298.4k — VERDICT r3 weak #3);
    per-rep times are logged so outliers stay diagnosable.
    """
    t0 = time.time()
    float(fn(batch))  # compile + first run, forced to completion
    compile_s = time.time() - t0
    log(f"[bench] {label}: compile+first={compile_s:.1f}s")
    for _ in range(warmup):
        t0 = time.time()
        float(fn(batch))
        log(f"[bench] {label}: warmup {1e3*(time.time()-t0):.1f}ms (dropped)")
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(fn(batch))  # scalar fetch forces real completion
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    log(
        f"[bench] {label}: best {min(times)*1e3:.1f}ms median {med*1e3:.1f}ms"
        f" reps={[round(t*1e3, 1) for t in times]}ms"
    )
    return times, compile_s


def time_solver(name, kkt_fn, batch, batch_size, reps, k2_default=9):
    """Per-solver throughput statistics via the finite-difference method.

    Returns mean/std/min/median/max solves/s (the reference's kNruns
    statistics, sample_problem_test.c:14-18,47-67) plus the compile+first
    latencies. Stats are computed over the K2-chain samples: per-solve
    time for rep i = (t2_i - median(t1)) / (K2 - K1), so std reflects the
    run-to-run variance of the long chain.
    """
    k1 = int(os.environ.get("BENCH_K1", "1"))
    k2 = int(os.environ.get("BENCH_K2", str(k2_default)))
    t1s, c1 = _time_stats(_chained(kkt_fn, k1), batch, reps, f"{name} K={k1}")
    if k2 == k1:
        # Long-running configs (seconds per batched solve): the ~25 ms
        # dispatch overhead is negligible, so the chained mean of the K=1
        # program IS the per-solve time — no second program to compile.
        per = [t / k1 for t in t1s]
        c2 = c1
    else:
        t2s, c2 = _time_stats(
            _chained(kkt_fn, k2), batch, reps, f"{name} K={k2}"
        )
        t1_med = sorted(t1s)[len(t1s) // 2]
        per = []
        for t2 in t2s:
            ps = (t2 - t1_med) / (k2 - k1)
            if ps <= 0.25 * t2 / k2:
                ps = t2 / k2  # dispatch noise swamped the difference
            per.append(ps)
    per_sorted = sorted(per)
    sps = [batch_size / p for p in per]
    mean = sum(sps) / len(sps)
    std = (sum((s - mean) ** 2 for s in sps) / len(sps)) ** 0.5
    out = {
        "mean": mean,
        "std": std,
        "min": min(sps),
        "median": batch_size / per_sorted[len(per_sorted) // 2],
        "max": max(sps),
        "best": max(sps),
        "ms_per_batched_solve": per_sorted[len(per_sorted) // 2] * 1e3,
        "compile_first_s": round(c1, 1),
        "compile_first_k2_s": round(c2, 1),
        # K=1-only entries include the ~25-80ms per-dispatch tunnel
        # overhead in every sample; the method field makes them
        # distinguishable from finite-difference numbers in the artifact.
        "method": "chained_mean_k1" if k2 == k1 else "finite_diff",
        "rep_ms": [round(1e3 * t, 1) for t in (t1s if k2 == k1 else t2s)],
    }
    log(
        f"[bench] {name}: {out['ms_per_batched_solve']:.2f} ms/batched-solve "
        f"(median, diff method) -> {out['median']:,.0f} solves/s "
        f"(mean {mean:,.0f} +- {std:,.0f})"
    )
    return out


ACCURACY_BAR = 1e-6  # the reference's assertion (sample_problem_test.c:150)


def accuracy_gate(results, batch, batch_size, nhorizon, reps):
    """On-chip accuracy artifact + hard gate (VERDICT r3 missing #2/#3).

    The reference's benchmark *is* a test: it times 100 solves AND asserts
    rsLQR==golden < 1e-6 in the same run (sample_problem_test.c:140-157).
    Here: refine.solve_refined_host factors/solves on the chip in f32 and
    evaluates residuals in host numpy float64 — the artifact records the
    f64 residual, the golden-solution agreement, AND the throughput of that
    f64-accurate path. Returns False if the bar fails (bench exits nonzero).
    """
    from rslqr_tpu import refine as _refine

    path = "/root/reference/lqr_prob_256.json"
    golden = None
    if nhorizon == 256 and os.path.exists(path):
        prob64, golden = rt.read_lqr_problem_json(path, dtype=None)
    else:
        prob64 = jax.tree.map(
            lambda x: np.asarray(x, np.float64),
            rt.double_integrator_problem(nhorizon, dtype=jnp.float32),
        )
    iters = int(os.environ.get("BENCH_REFINE_F64_ITERS", "3"))
    kkt, res = _refine.solve_refined_host(prob64, iterations=iters)
    results["refined_f64_residual"] = res
    log(f"[bench] refined f64 ({iters} iters) KKT residual: {res:.3e}")
    ok = res < ACCURACY_BAR
    if golden is not None:
        dg = float(np.max(np.abs(kkt - golden)))
        results["refined_f64_vs_golden"] = dg
        log(f"[bench] refined f64 max |kkt - golden|: {dg:.3e}")
        ok = ok and dg < ACCURACY_BAR

    # Gate the device-resident double-float path on the same golden
    # problem (round 5: the production-rate f64-accurate path — the f64
    # residual is emulated on device as (hi, lo) f32 pairs, so the whole
    # refined solve is one compiled program with no per-iteration host
    # round trips).
    kkt_d, res_d = _refine.solve_refined_device(prob64, iterations=iters)
    results["refined_f64_device_residual"] = res_d
    log(f"[bench] refined f64 DEVICE ({iters} iters) residual: {res_d:.3e}")
    ok = ok and res_d < ACCURACY_BAR
    if golden is not None:
        dgd = float(np.max(np.abs(kkt_d - golden)))
        results["refined_f64_device_vs_golden"] = dgd
        log(f"[bench] refined f64 DEVICE max |kkt - golden|: {dgd:.3e}")
        ok = ok and dgd < ACCURACY_BAR

    # Throughput of the f64-accurate path on the batched config:
    # refine.refined_kkt_device — the whole df-refined solve is ONE
    # device program producing packed (hi, lo) KKT arrays; only a scalar
    # leaves the device (the earlier solve_refined_device wall-clock
    # fetched the full ~70 MB batch through the tunnel every rep, which
    # measured the tunnel, not the solver: 194 "solves"/s).
    def run_kkt(b):
        hi, lo, res = _refine.refined_kkt_device(b, iterations=iters)
        return jnp.sum(hi) + jnp.sum(lo) + res

    fn = jax.jit(run_kkt)
    times, compile_s = _time_stats(
        lambda b: float(fn(b)), batch, min(reps, 3),
        "refined_f64_device", warmup=1
    )
    med = sorted(times)[len(times) // 2]
    sps = batch_size / med
    results["refined_f64_solves_per_s"] = round(sps, 1)
    results["refined_f64_detail"] = {
        "ms_per_batched_solve": round(med * 1e3, 1),
        "compile_first_s": round(compile_s, 1),
        "method": "wall_clock_device_df",
        "rep_ms": [round(1e3 * t, 1) for t in times],
    }
    log(f"[bench] refined_f64_device: {sps:,.0f} solves/s (wall)")
    if not ok:
        log(f"[bench] ACCURACY GATE FAILED: bar {ACCURACY_BAR}")
    return ok


def _main_batch(nhorizon, batch_size):
    path = "/root/reference/lqr_prob_256.json"
    if nhorizon == 256 and os.path.exists(path):
        prob, _ = rt.read_lqr_problem_json(path, dtype=jnp.float32)
    else:
        prob = rt.double_integrator_problem(nhorizon, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch_size)
    return rt.batch_problems(prob, keys)


# f32-appropriate quadruped bars: measured residuals are ~2e-3 (rslqr) /
# ~1e-3 (pscan) relative and agreement ~1e-4 relative; gates sit ~5x above.
QUAD_RESIDUAL_BAR = 3e-2   # relative max-norm KKT residual
QUAD_AGREE_BAR = 3e-3      # relative max-norm rslqr vs pscan difference


def quadruped_accuracy_gate(results, qbatch, quad_names):
    """On-chip accuracy evidence at the quadruped scale: per-family f32
    KKT residuals + cross-family agreement on one scenario chunk, gated
    with f32-appropriate relative bars. The quadruped f32 kernels
    (unpivoted LU scan combines at nx=36) previously shipped with zero
    on-chip accuracy numbers (VERDICT r4 missing #1).

    The sub-batch is one full 128-scenario chunk: smaller batches fall
    off the lane-aligned element-major path onto the vmap fallback,
    whose fully-unrolled N=512 recursion both compiles for tens of
    minutes through the remote helper AND is not the path the timing
    runs exercise — the gate must test the production program."""
    gb = min(128, qbatch.x0.shape[0])
    sub = jax.tree.map(lambda x: x[:gb], qbatch)
    outs = {}
    for name in quad_names:
        out = jax.jit(SOLVERS[name])(sub)
        outs[name] = out
    scale = max(
        float(jnp.max(jnp.abs(outs[n]))) for n in outs
    )
    ok = True
    for name, out in outs.items():
        res = 0.0
        for i in range(2):
            pi = jax.tree.map(lambda x: x[i], sub)
            res = max(res, float(rt.kkt_residual(pi, out[i])))
        rel = res / max(scale, 1.0)
        results[f"{name}_quadruped_kkt_residual"] = res
        results[f"{name}_quadruped_kkt_residual_rel"] = rel
        log(f"[bench] {name} quadruped f32 KKT residual: {res:.3e}"
            f" (rel {rel:.3e})")
        ok = ok and rel < QUAD_RESIDUAL_BAR
    if len(outs) == 2:
        a, b = (outs[n] for n in quad_names)
        diff = float(jnp.max(jnp.abs(a - b)))
        rel = diff / max(scale, 1.0)
        results["rslqr_vs_pscan_quadruped_max_diff"] = diff
        results["rslqr_vs_pscan_quadruped_max_diff_rel"] = rel
        log(f"[bench] quadruped rslqr vs pscan max diff: {diff:.3e}"
            f" (rel {rel:.3e})")
        ok = ok and rel < QUAD_AGREE_BAR
    if not ok:
        log(f"[bench] QUADRUPED ACCURACY GATE FAILED "
            f"(bars: residual {QUAD_RESIDUAL_BAR}, agree {QUAD_AGREE_BAR})")
    return ok


def _quadruped_batch(nhorizon, batch_size):
    # BASELINE.md config: nx=36, nu=12, N=512, 256 scenarios. A single
    # batched program needs >21GB of factor/scan state at nx=36 — chunk
    # the scenario batch to fit one chip's 16GB HBM.
    prob = rt.random_problem(
        jax.random.PRNGKey(1), nhorizon, 36, 12, jnp.float32
    )
    keys = jax.random.split(jax.random.PRNGKey(0), batch_size)
    return rt.batch_problems(prob, keys)


def main():
    reps = int(os.environ.get("BENCH_REPS", "5"))
    which = os.environ.get("BENCH_SOLVER", "all")
    chunk = int(os.environ.get("BENCH_CHUNK", "0"))
    quad_only = os.environ.get("BENCH_CONFIG") == "quadruped"

    # One driver run produces every headline family in `detail` (VERDICT r2
    # item #3): pscan / rslqr / refine on the N=256 config, plus both
    # solvers on the quadruped config, unless narrowed via env.
    if quad_only:
        names = []
        quad_names = ["rslqr", "pscan"] if which == "all" else which.split(",")
    elif which == "all":
        names = ["pscan", "rslqr", "refine"]
        quad_names = ["rslqr", "pscan"]
    elif which == "both":
        names, quad_names = ["pscan", "rslqr"], []
    else:
        names, quad_names = which.split(","), []

    batch_size = int(os.environ.get("BENCH_BATCH", "1024"))
    nhorizon = int(os.environ.get("BENCH_HORIZON", "256"))
    qb = int(os.environ.get("BENCH_QUAD_BATCH", "256"))
    qn = int(os.environ.get("BENCH_QUAD_HORIZON", "512"))
    if quad_only:
        qb = int(os.environ.get("BENCH_BATCH", str(qb)))
        qn = int(os.environ.get("BENCH_HORIZON", str(qn)))

    log(f"[bench] backend={jax.default_backend()} device={jax.devices()[0]}")
    results = {}

    if names:
        batch = _main_batch(nhorizon, batch_size)
        jax.block_until_ready(batch)
        log(f"[bench] main config B={batch_size} N={nhorizon} nx=6 nu=3 "
            f"solvers={names}")
        for name in names:
            fn = SOLVERS[name]
            if chunk:
                fn = _chunked(fn, chunk)
            try:
                results[name] = time_solver(name, fn, batch, batch_size, reps)
            except Exception as e:
                log(f"[bench] {name} FAILED: {e}")
                results[name] = {"error": str(e)[:300]}

        # f32 solution-quality context (not part of the headline metric).
        single = jax.tree.map(lambda x: x[:1], batch)
        out = jax.jit(rslqr.solve_kkt)(single)[0]
        res = float(rt.kkt_residual(jax.tree.map(lambda x: x[0], batch), out))
        log(f"[bench] rslqr f32 KKT residual: {res:.3e}")
        results["rslqr_f32_kkt_residual"] = res
        if "refine" in names:
            outr = jax.jit(_refine_kkt)(single)[0]
            resr = float(
                rt.kkt_residual(jax.tree.map(lambda x: x[0], batch), outr)
            )
            log(f"[bench] refined (2 iter) f32 KKT residual: {resr:.3e}")
            results["refine_f32_kkt_residual"] = resr

        # On-chip f64-refined accuracy artifact + hard gate.
        if not os.environ.get("BENCH_SKIP_ACCURACY"):
            try:
                gate_ok = accuracy_gate(
                    results, batch, batch_size, nhorizon, reps
                )
            except Exception as e:
                log(f"[bench] accuracy gate FAILED to run: {e}")
                results["refined_f64_error"] = str(e)[:300]
                gate_ok = False
        else:
            gate_ok = True
    else:
        gate_ok = True

    if quad_names:
        qbatch = _quadruped_batch(qn, qb)
        jax.block_until_ready(qbatch)
        log(f"[bench] quadruped config B={qb} N={qn} nx=36 nu=12 "
            f"solvers={quad_names}")
        # Per-solver scenario-chunk defaults: largest that fits one chip's
        # HBM for each program (rslqr's vmap grid state is leaner than the
        # scan's element arrays).
        for name in quad_names:
            # 128 keeps every slab's trailing axis lane-aligned (the
            # element-plane kernels' layout contract) — 32 was measured
            # 2.7x slower from relayout passes alone.
            qchunk = int(os.environ.get("BENCH_QUAD_CHUNK", "128"))
            log(f"[bench] {name}_quadruped chunk={qchunk}")
            fn = _chunked(SOLVERS[name], qchunk)
            # K=3 finite-diff chains: the configs now run 0.2-0.7 s per
            # batched solve (round 3: 3-7 s, when a long chain crashed the
            # tunnel worker and K=1 chained means — which carry the
            # ~25-80 ms per-dispatch tunnel overhead in every sample —
            # were the only option).
            try:
                results[f"{name}_quadruped"] = time_solver(
                    f"{name}_quadruped", fn, qbatch, qb,
                    min(reps, 3), k2_default=3,
                )
            except Exception as e:  # keep the artifact if one family dies
                log(f"[bench] {name}_quadruped FAILED: {e}")
                results[f"{name}_quadruped"] = {"error": str(e)[:300]}

        # Quadruped-scale accuracy: on-chip f32 KKT residuals per family
        # and rslqr<->pscan cross-solver agreement on the same chunk,
        # hard-gated (VERDICT r4 #4; ref sample_problem_test.c:140-157).
        if not os.environ.get("BENCH_SKIP_ACCURACY"):
            try:
                gate_ok = quadruped_accuracy_gate(
                    results, qbatch, quad_names
                ) and gate_ok
            except Exception as e:
                log(f"[bench] quadruped accuracy gate FAILED to run: {e}")
                results["quadruped_accuracy_error"] = str(e)[:300]
                gate_ok = False

    timed = {
        k: v
        for k, v in results.items()
        if isinstance(v, dict) and "median" in v
    }
    if names:
        head_pool = {k: v for k, v in timed.items() if k in names}
        cfg = ""
        hb, hn = batch_size, nhorizon
    else:
        head_pool = timed
        cfg = "_quadruped"
        hb, hn = qb, qn
    if not head_pool:
        print(json.dumps({"metric": "bench_failed", "value": 0.0,
                          "unit": "solves/s", "vs_baseline": 0.0,
                          "detail": {k: str(v)[:200] for k, v in results.items()}}))
        return
    best_name = max(head_pool, key=lambda k: head_pool[k]["median"])
    value = head_pool[best_name]["median"]
    print(
        json.dumps(
            {
                "metric": (
                    f"lqr_solves_per_sec_chip_n{hn}_b{hb}"
                    f"_f32{cfg}_{best_name}"
                ),
                "value": round(value, 1),
                "unit": "solves/s",
                "vs_baseline": round(value / BASELINE_SOLVES_PER_SEC, 3),
                "detail": {
                    k: (
                        {
                            s: (round(v, 1) if isinstance(v, float) else v)
                            for s, v in st.items()
                        }
                        if isinstance(st, dict)
                        else st
                    )
                    for k, st in results.items()
                },
            }
        )
    )
    if not gate_ok:
        # The reference's benchmark asserts accuracy alongside speed
        # (sample_problem_test.c:150-157); a silent numerical regression
        # must not ship a green BENCH artifact.
        sys.exit(1)


if __name__ == "__main__":
    main()

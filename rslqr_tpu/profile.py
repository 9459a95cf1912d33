"""Per-phase solve profiling — the ``NdLqrProfile`` analogue.

TPU-native counterpart of the reference's two timing mechanisms (SURVEY §5.1):
the phase profiler (``NdLqrProfile`` + OMP_TICK/OMP_TOC, solve.c:15-25,
solver.h:31-74) and the global linalg time accumulator
(``linalg_utils.{h,c}``). Under XLA a fused jit program has no internal
phase boundaries, so phases are timed by running each stage as its own jitted
function with forced completion — accurate for profiling, not used on the
production fused path. ``jax.profiler`` traces cover intra-program analysis.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .problem import LQRProblem
from .tree import build_tree_tables
from . import rslqr


@dataclasses.dataclass
class SolveProfile:
    """Per-phase wall-clock of one rsLQR solve (ref solver.h:31-39).

    Times in milliseconds. ``num_devices`` replaces the reference's
    ``num_threads`` (the parallel width on TPU is the device count times the
    per-chip vector parallelism).
    """

    t_total_ms: float = 0.0
    t_leaves_ms: float = 0.0
    t_products_ms: float = 0.0  # factorization sweep: inner products + chol
    t_cholesky_ms: float = 0.0
    t_cholsolve_ms: float = 0.0
    t_shur_ms: float = 0.0
    num_devices: int = -1

    def reset(self) -> None:
        """Zero all timings (ref ndlqr_ResetProfile, solver.c:16-23)."""
        self.t_total_ms = 0.0
        self.t_leaves_ms = 0.0
        self.t_products_ms = 0.0
        self.t_cholesky_ms = 0.0
        self.t_cholsolve_ms = 0.0
        self.t_shur_ms = 0.0

    def copy(self) -> "SolveProfile":
        """Ref ndlqr_CopyProfile (solver.c:25-33)."""
        return dataclasses.replace(self)

    def print(self) -> None:
        """Ref ndlqr_PrintProfile (solver.c:35-43)."""
        print(f"Solved with {self.num_devices} device(s)")
        print(f"Solve Total:    {self.t_total_ms:.3f} ms")
        print(f"Solve Leaves:   {self.t_leaves_ms:.3f} ms")
        print(f"Solve Products: {self.t_products_ms:.3f} ms")
        print(f"Solve Cholesky: {self.t_cholesky_ms:.3f} ms")
        print(f"Solve Solve:    {self.t_cholsolve_ms:.3f} ms")
        print(f"Solve Shur:     {self.t_shur_ms:.3f} ms")

    def compare(self, other: "SolveProfile") -> None:
        """A/B comparison with speedups (ref ndlqr_CompareProfile, solver.c:49-58)."""

        def comp(label, base, new):
            ratio = base / new if new else float("inf")
            print(f"{label} {base:.3f} / {new:.3f} ({ratio:.2f} speedup)")

        print(f"Num Devices:     {self.num_devices} / {other.num_devices}")
        comp("Solve Total:    ", self.t_total_ms, other.t_total_ms)
        comp("Solve Leaves:   ", self.t_leaves_ms, other.t_leaves_ms)
        comp("Solve Products: ", self.t_products_ms, other.t_products_ms)
        comp("Solve Cholesky: ", self.t_cholesky_ms, other.t_cholesky_ms)
        comp("Solve CholSolve:", self.t_cholsolve_ms, other.t_cholsolve_ms)
        comp("Solve Shur Comp:", self.t_shur_ms, other.t_shur_ms)


def _timed(fn: Callable, *args) -> float:
    """Run a jitted stage to completion, return milliseconds."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    # Force a tiny host fetch: on remote-TPU tunnels block_until_ready alone
    # can return before execution finishes (see bench.py).
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jnp.asarray(leaf).ravel()[0].item()
    return (time.perf_counter() - t0) * 1e3


def profile_solve(prob: LQRProblem, repeats: int = 3) -> SolveProfile:
    """Time each solver phase separately (ref ENABLE_PROFILER path of
    ndlqr_Solve, solve.c:60-132). Phases are jitted independently, so the
    total differs from the fused-production solve — use it for *relative*
    stage attribution, as the reference's parallel_test.c does."""
    t = build_tree_tables(prob.A.shape[-3])
    nb = prob.A.ndim - 3
    pbl = rslqr._to_batch_last(prob, nb)

    leaf = jax.jit(lambda p: rslqr._leaf_solve(p, t.levels, t.depth, nb))
    sweep = jax.jit(lambda p, f: _sweep_all(p, f, t))
    rhs = jax.jit(lambda p, f, r: rslqr._solve_rhs_bl(p, f, r, t))

    prof = SolveProfile(num_devices=jax.local_device_count())
    # Warm-up compiles.
    Fl, Fx, Fu, zy, zx, zu = leaf(pbl)
    fact0 = rslqr.RsLqrFactorization(
        Flambda=Fl, Fstate=Fx, Finput=Fu,
        chol=jnp.zeros((t.nhorizon - 1,) + Fl.shape[2:], Fl.dtype), nbatch=nb,
    )
    fact = sweep(pbl, fact0)
    _ = rhs(pbl, fact, (zy, zx, zu))

    best = None
    for _ in range(repeats):
        p = SolveProfile(num_devices=prof.num_devices)
        p.t_leaves_ms = _timed(leaf, pbl)
        p.t_products_ms = _timed(sweep, pbl, fact0)
        p.t_cholsolve_ms = 0.0  # folded into the fused sweep stage
        p.t_shur_ms = _timed(rhs, pbl, fact, (zy, zx, zu))
        p.t_total_ms = p.t_leaves_ms + p.t_products_ms + p.t_shur_ms
        if best is None or p.t_total_ms < best.t_total_ms:
            best = p
    return best


def _sweep_all(pbl, fact, t):
    for level in range(t.depth):
        fact = rslqr._sweep_level(pbl, t, level, fact)
    return fact


def linalg_flop_estimate(nstates: int, ninputs: int, nhorizon: int) -> dict:
    """Analytic FLOP/byte accounting of one rsLQR solve.

    The analogue of the reference's linalg time accumulator
    (MATRIX_LATIME_ENABLE, linalg_utils.h:4-12): under jit individual linalg
    calls can't be clocked, so the solve summary reports the *model* instead —
    per-stage FLOPs and minimum HBM traffic — which combined with the
    measured wall time yields achieved intensity.
    """
    n, m, N = nstates, ninputs, nhorizon
    depth = (N - 1).bit_length()
    gemm_nn = 2 * n * n * n
    gemm_mn = 2 * m * n * n
    chol = n**3 // 3
    trsm_nn = 2 * n * n * n

    leaves = N * (2 * n * n + 2 * m * n)  # diagonal scalings
    products = sum(
        (1 << (depth - L - 1)) * (depth - L) * (gemm_nn + gemm_mn)
        for L in range(depth)
    )
    cholesky = (N - 1) * chol
    cholsolve = sum(
        (1 << (depth - L - 1)) * (depth - L - 1) * trsm_nn for L in range(depth)
    )
    shur = sum(
        N * (depth - L - 1) * (2 * gemm_nn + gemm_mn) for L in range(depth)
    )
    rhs = N * depth * (4 * n * n + 2 * m * n)
    total = leaves + products + cholesky + cholsolve + shur + rhs
    # Minimum slab traffic (read+write of the touched factor slabs per level).
    slab = N * (2 * n * n + m * n)
    bytes_min = 4 * sum(
        3 * slab * (depth - L) for L in range(depth)
    )
    return {
        "flops_leaves": leaves,
        "flops_products": products,
        "flops_cholesky": cholesky,
        "flops_cholsolve": cholsolve,
        "flops_shur": shur,
        "flops_rhs": rhs,
        "flops_total": total,
        "hbm_bytes_min_f32": bytes_min,
        "arithmetic_intensity": total / bytes_min,
    }


def print_solve_summary(
    solve_time_ms: float,
    num_devices: Optional[int] = None,
    backend: Optional[str] = None,
) -> None:
    """Ref ndlqr_PrintSolveSummary (solver.c:196-209)."""
    print("rsLQR-TPU Solve Summary")
    print("-----------------------")
    print("  TPU-native recursive Schur-complement LQR solver (JAX/XLA).")
    print(f"  Solve time:  {solve_time_ms:f} ms")
    nd = num_devices if num_devices is not None else jax.local_device_count()
    print(f"  Solved with {nd} device(s).")
    print(f"  Linear algebra backend: {backend or jax.default_backend()}")

"""Pallas TPU kernels: mid-size-block linear algebra on element planes.

The reference guarantees usable performance at every block size by swapping
linear-algebra backends (``src/linalg.c:153-190``) and hand-writing kernels
exactly where stock libraries fall short (``src/matmul.c:31-574``). On TPU
the regime where the stock path falls short is mid-size blocks
(8 < n <= ~64, e.g. the quadruped config's nx=36): XLA's batched Cholesky/LU
custom calls serialize per column (~4 GFLOP/s measured at [8192, 36, 36]),
and its batched ``dot_general`` pads the 36-wide operands onto 128-wide MXU
tiles (~8% utilization). Neither layout fits the hardware.

This module is the TPU-native answer, completing the dispatch at every size:

* Arrays are **element-plane slabs** ``[p, K, P1, P2]``: each block element
  ``(i, k)`` is a dense ``[P1, P2]`` plane carrying the (knot x batch) or
  (scan x batch) grid on full (8, 128) float32 tiles — zero padding at ANY
  block size, unlike the 36/128-lane occupancy of mat-last layouts.
* A block matmul unrolls the (static, mid-size) contraction into K
  plane-FMA statements on the VPU, looping over output block rows with the
  row accumulator in registers. The O(n^3) FLOP bulk of the blocked panel
  factorizations in :mod:`rslqr_tpu.linalg` routes through here; only the
  tiny panel factorizations stay unrolled XLA lane code.
* Each call is ONE fused HBM pass (read A, B, optional C-in; write C-out,
  aliased onto C-in) — the XLA broadcast-multiply-reduce formulation of the
  same contraction materializes padded 5-D temps and OOMs the quadruped
  config (measured round 3).
* :func:`schur_update_planes` additionally fuses the nested-dissection
  Schur update's separator write-back and calc_lambda masking
  (``ndlqr_UpdateShurFactor`` + ``ndlqr_ShouldCalcLambda``,
  nested_dissection.c:154-177) into the same pass, with the knot index
  recovered from the flattened plane position.

Callers flatten arbitrary trailing batch dims ``*b`` to ``(F // 128, 128)``
(a free reshape) before calling; dispatch helpers live in
:mod:`rslqr_tpu.linalg` (``_bgemm_mid``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plane-tile defaults: (T1 rows of 128 lanes) per grid step. T1=8 keeps the
# four 36x36-block operands at ~21 MB of pipelined VMEM blocks.
T1 = 8
T2 = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def _gemm_kernel(*refs, p, K, q, ta, tbt, has_cin, sub, lam_level, logb, t1,
                 has_diag, dconst, sym, has_ks):
    """Shared body: C[i, j] = sum_k A[i, k] * B[k, j] over [t1, t2] planes.

    ``ta``: A is stored transposed ([K, p, ...], read A[k, i]).
    ``tbt``: B is stored transposed ([q, K, ...], read B[j, k]).
    ``has_cin``/``sub``: C = Cin -/+ A@B instead of plain A@B.
    ``lam_level``: when >= 0, apply the Schur lambda-row masking for tree
    level ``lam_level``: rows whose knot is a range start skip the update
    (except knot 0) and separator+1 rows are overwritten with B's value
    (the solved separator block) — nested_dissection.c:154-177 fused in.
    ``logb``: log2(batch lanes per knot) for knot-id recovery from the
    flattened plane position (plane element (r, c) is flat r*t2 + c).
    ``has_diag``/``dconst``: fused diagonal add — C[i, i] += diag[i] planes
    and/or the constant ``dconst`` (kills the separate ``.at[diag].add``
    slab pass of the scan combines' ``I + C J`` / ``J + diag(Q)`` algebra).
    ``sym``: the output is symmetric (p == q, e.g. F' (J M) F, W V' with
    W = F M1U, V' = (V F')'): only the lower triangle is computed (half the
    FMAs) and the upper mirrors it with register copies. Requires a
    symmetric ``Cin`` when combined with ``has_cin``.
    ``has_ks``: fused contraction-index scale ``op(A) diag(ks) op(B)``
    (e.g. ``F' diag(Q) M F`` with a diagonal middle factor) — applied on
    the A side, one scalar-plane multiply per (i, k) instead of a
    separate row-scale slab pass.
    """
    a_ref, b_ref = refs[0], refs[1]
    k_next = 2
    c_ref = refs[k_next] if has_cin else None
    k_next += int(has_cin)
    d_ref = refs[k_next] if has_diag else None
    k_next += int(has_diag)
    ks_ref = refs[k_next] if has_ks else None
    k_next += int(has_ks)
    o_ref = refs[k_next]

    if lam_level >= 0:
        # Plane element (row r, col c) of the flattened [P1, P2] grid holds
        # flat index r * P2 + c; its knot is flat >> log2(batch width).
        i0 = pl.program_id(0)
        j0 = pl.program_id(1)
        t2 = o_ref.shape[-1]
        P2 = t2 * pl.num_programs(1)
        flat = (
            (i0 * t1 + jax.lax.broadcasted_iota(jnp.int32, (t1, t2), 0)) * P2
            + j0 * t2
            + jax.lax.broadcasted_iota(jnp.int32, (t1, t2), 1)
        )
        knots = flat >> logb
        halfspan = 1 << lam_level
        span = 2 << lam_level
        keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
        sep = (knots & (span - 1)) == halfspan

    def lhs(i, k):
        v = a_ref[k, i] if ta else a_ref[i, k]
        return v * ks_ref[k] if has_ks else v

    def rhs(k):
        return b_ref[:, k] if tbt else b_ref[k]

    if sym:
        # Lower triangle only: row i needs columns 0..i. Rows are stored as
        # they complete; a final mirror pass copies o[j, i] -> o[i, j]
        # plane-by-plane (register moves, vs K FMAs per skipped element).
        for i in range(p):
            w = i + 1
            acc = rhs(0)[:w] * lhs(i, 0)[None]
            for k in range(1, K):
                acc = acc + rhs(k)[:w] * lhs(i, k)[None]
            if has_cin:
                acc = c_ref[i, :w] - acc if sub else c_ref[i, :w] + acc
            o_ref[i, :w] = acc
            if has_diag or dconst:
                # Diagonal adds as a second static-index ref store: a value
                # .at[].add lowers to scatter-add, which Mosaic does not
                # implement (interpret mode masked this).
                dg = acc[w - 1]
                if has_diag:
                    dg = dg + d_ref[i]
                if dconst:
                    dg = dg + dconst
                o_ref[i, i] = dg
        for i in range(p):
            for j in range(i + 1, p):
                o_ref[i, j] = o_ref[j, i]
        return

    def body(i, _):
        acc = rhs(0) * lhs(i, 0)[None]
        for k in range(1, K):
            acc = acc + rhs(k) * lhs(i, k)[None]
        if lam_level >= 0:
            v = c_ref[i] - jnp.where(keep[None], acc, 0.0)
            o_ref[i] = jnp.where(sep[None], b_ref[i], v)
        elif has_cin:
            acc = c_ref[i] - acc if sub else c_ref[i] + acc
            o_ref[i] = acc
        else:
            o_ref[i] = acc
        return 0

    if has_diag or dconst:
        # Unrolled rows (the diagonal index varies per row).
        for i in range(p):
            acc = rhs(0) * lhs(i, 0)[None]
            for k in range(1, K):
                acc = acc + rhs(k) * lhs(i, k)[None]
            if has_cin:
                acc = c_ref[i] - acc if sub else c_ref[i] + acc
            o_ref[i] = acc
            # Diagonal adds as a second static-index ref store (a value
            # .at[].add lowers to scatter-add; Mosaic has no lowering).
            dg = acc[i]
            if has_diag:
                dg = dg + d_ref[i]
            if dconst:
                dg = dg + dconst
            o_ref[i, i] = dg
        return

    jax.lax.fori_loop(0, p, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ta", "tbt", "sub", "lam_level", "logb", "interpret", "t1",
        "dconst", "sym",
    ),
)
def _pgemm_call(
    A: jax.Array,            # [p, K, P1, P2] (or [K, p, ..] when ta)
    B: jax.Array,            # [K, q, P1, P2] (or [q, K, ..] when tbt)
    Cin: Optional[jax.Array] = None,  # [p, q, P1, P2], aliased to the output
    diag: Optional[jax.Array] = None,  # [p, P1, P2] added to the diagonal
    kscale: Optional[jax.Array] = None,  # [K, P1, P2] contraction scale
    *,
    ta: bool = False,
    tbt: bool = False,
    sub: bool = True,
    lam_level: int = -1,
    logb: int = 0,
    interpret: bool = False,
    t1: int = T1,
    dconst: float = 0.0,
    sym: bool = False,
):
    P1, P2 = A.shape[-2:]
    p = A.shape[1] if ta else A.shape[0]
    K = A.shape[0] if ta else A.shape[1]
    q = B.shape[0] if tbt else B.shape[1]
    if (diag is not None or dconst or sym) and p != q:
        raise ValueError(f"diag/sym need a square output, got {p}x{q}")
    if sym and lam_level >= 0:
        raise ValueError("sym and lam_level are mutually exclusive")
    t2 = min(T2, P2)
    grid = (P1 // t1, P2 // t2)
    spec = lambda d0, d1: pl.BlockSpec(
        (d0, d1, t1, t2), lambda i, j: (0, 0, i, j)
    )
    vspec = lambda d0: pl.BlockSpec((d0, t1, t2), lambda i, j: (0, i, j))
    in_specs = [
        spec(*((K, p) if ta else (p, K))),
        spec(*((q, K) if tbt else (K, q))),
    ]
    args = [A, B]
    aliases = {}
    if Cin is not None:
        in_specs.append(spec(p, q))
        args.append(Cin)
        aliases[2] = 0
    if diag is not None:
        in_specs.append(vspec(p))
        args.append(diag)
    if kscale is not None:
        in_specs.append(vspec(K))
        args.append(kscale)
    kernel = functools.partial(
        _gemm_kernel, p=p, K=K, q=q, ta=ta, tbt=tbt,
        has_cin=Cin is not None, sub=sub, lam_level=lam_level, logb=logb,
        t1=t1, has_diag=diag is not None, dconst=dconst, sym=sym,
        has_ks=kscale is not None,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(p, q),
        out_shape=jax.ShapeDtypeStruct((p, q, P1, P2), A.dtype),
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * K * q * P1 * P2,
            bytes_accessed=4 * P1 * P2 * (
                p * K + K * q + (2 * p * q if Cin is not None else p * q)
            ),
            transcendentals=0,
        ),
    )(*args)


def pgemm(A, B, *, ta=False, tbt=False, interpret=False):
    """Planewise block matmul ``C = op(A) @ op(B)`` on [.., P1, P2] slabs."""
    return _pgemm_call(A, B, None, ta=ta, tbt=tbt, interpret=interpret)


def pgemm_acc(A, B, Cin, *, sub=True, ta=False, tbt=False, interpret=False):
    """``C = Cin -/+ op(A) @ op(B)`` in one fused pass; ``Cin`` is donated
    (aliased onto the output)."""
    return _pgemm_call(
        A, B, Cin, ta=ta, tbt=tbt, sub=sub, interpret=interpret
    )


def schur_update_planes(
    FL, fsol_full, Fin, *, level, lam, logb, interpret=False
):
    """Mid-block Schur update of one upper-level slab:

      out = Fin - FL @ fsol          (x / u slabs, ``lam=False``)
      out = where(sep+1, fsol, Fin - where(calc_lambda, FL @ fsol, 0))
                                     (lambda slab, ``lam=True``)

    All operands are flattened element-plane slabs [p|n, n, F//128, 128]
    with ``fsol`` pre-broadcast over each group's knots; ``logb`` =
    log2(batch width) recovers knot ids from plane positions.
    Ref nested_dissection.c:154-177 / solve.c:119-131.
    """
    return _pgemm_call(
        FL, fsol_full, Fin,
        lam_level=level if lam else -1, logb=logb, sub=True,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused factorization kernels: the whole batched mid-block Cholesky /
# Cholesky-solve / LU-solve as ONE kernel each.
#
# The blocked-panel algorithms in linalg.py express the panel math as
# unrolled elementwise XLA ops — thousands of tiny ops per tree level at
# n=36, which dominate both runtime (fusion-boundary traffic + dispatch)
# and compile time (the quadruped solve spent 800+ s compiling them).
# These kernels run the textbook column algorithms *inside* VMEM with a
# fori loop over columns: O(1) XLA ops per stage, one HBM pass per operand.
# The reference's equivalent regime-fix is its unblocked clap Cholesky
# (linalg_custom.c:88-111) + backend dispatch (linalg.c:153-190).
# ---------------------------------------------------------------------------


def _chol_kernel(a_ref, o_ref, *, n):
    """Left-looking Cholesky, statically unrolled with exact triangular
    slices. The earlier fori-loop formulation paid full-length masked
    k-sums plus an O(n) masked row-pick per element access — measured
    0.39 TF/s vs 2.5 for the gemm kernel at n=36; exact slicing removes
    the ~3x wasted vector ops."""
    o_ref[:] = jnp.zeros_like(o_ref)
    for j in range(n):
        acc = a_ref[j:, j]  # [n - j, t1, t2] column tail
        for k in range(j):
            acc = acc - o_ref[j:, k] * o_ref[j, k][None]
        rinv = jax.lax.rsqrt(acc[0])
        o_ref[j:, j] = acc * rinv[None]  # row j: d * rsqrt(d) = sqrt(d)


def _cho_solve_kernel(l_ref, b_ref, o_ref, *, n, w):
    """Solve (L L') X = B: forward then back substitution, X in-place in
    the output block (aliased onto B); statically unrolled exact loops."""
    o_ref[:] = b_ref[:]
    for i in range(n):
        acc = o_ref[i]  # [w, t1, t2]
        for k in range(i):
            acc = acc - l_ref[i, k][None] * o_ref[k]
        o_ref[i] = acc * pl.reciprocal(l_ref[i, i], approx=False)[None]
    for i in reversed(range(n)):
        acc = o_ref[i]
        for k in range(i + 1, n):
            acc = acc - l_ref[k, i][None] * o_ref[k]  # (L')[i, k] = L[k, i]
        o_ref[i] = acc * pl.reciprocal(l_ref[i, i], approx=False)[None]


def _lu_solve_kernel(*refs, n, nrhs):
    """Solve ``A X_r = B_r`` for ``nrhs`` right-hand sides with ONE
    in-VMEM unpivoted Doolittle LU + substitutions per RHS.

    No pivoting: intended for well-conditioned blocks like the parallel
    scan combine's ``I + C J`` (eigenvalues >= 1; see linalg.blu_factor).
    Multiple RHS operands let the combine skip the stacked-RHS concat and
    slice-back copies entirely. Statically unrolled with exact triangular
    slices (the masked fori version measured 1.1 TF/s; see _chol_kernel).
    """
    a_ref = refs[0]
    b_refs = refs[1 : 1 + nrhs]
    o_refs = refs[1 + nrhs : 1 + 2 * nrhs]
    lu_ref = refs[-1]
    lu_ref[:] = a_ref[:]
    for k in range(n):
        inv = pl.reciprocal(lu_ref[k, k], approx=False)  # [t1, t2]
        if k + 1 < n:
            factors = lu_ref[k + 1 :, k] * inv[None]  # [n-k-1, t1, t2]
            lu_ref[k + 1 :, k] = factors
            row = lu_ref[k, k + 1 :]
            lu_ref[k + 1 :, k + 1 :] = (
                lu_ref[k + 1 :, k + 1 :] - factors[:, None] * row[None, :]
            )

    for b_ref, o_ref in zip(b_refs, o_refs):
        o_ref[:] = b_ref[:]
        for i in range(1, n):  # unit-lower forward substitution
            acc = o_ref[i]
            for k in range(i):
                acc = acc - lu_ref[i, k][None] * o_ref[k]
            o_ref[i] = acc
        for i in reversed(range(n)):  # U back substitution
            acc = o_ref[i]
            for k in range(i + 1, n):
                acc = acc - lu_ref[i, k][None] * o_ref[k]
            o_ref[i] = acc * pl.reciprocal(lu_ref[i, i], approx=False)[None]


@functools.partial(jax.jit, static_argnames=("interpret", "t1"))
def pchol(A: jax.Array, *, interpret: bool = False, t1: int = T1):
    """Batched Cholesky of SPD planes blocks ``[n, n, P1, P2]`` -> lower L,
    one fused kernel (clap_CholeskyFactorize's planewise twin)."""
    n, _, P1, P2 = A.shape
    t2 = min(T2, P2)
    spec = pl.BlockSpec((n, n, t1, t2), lambda i, j: (0, 0, i, j))
    return pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        grid=(P1 // t1, P2 // t2),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(A.shape, A.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=n * n * n * P1 * P2,
            bytes_accessed=8 * n * n * P1 * P2,
            transcendentals=n * P1 * P2,
        ),
    )(A)


@functools.partial(jax.jit, static_argnames=("interpret", "t1"))
def pcho_solve(L: jax.Array, B: jax.Array, *, interpret=False, t1: int = T1):
    """Solve ``(L L') X = B`` on planes blocks in one fused kernel;
    ``B`` [n, w, P1, P2] is donated."""
    n, _, P1, P2 = L.shape
    w = B.shape[1]
    t2 = min(T2, P2)
    spec = lambda c: pl.BlockSpec((n, c, t1, t2), lambda i, j: (0, 0, i, j))
    return pl.pallas_call(
        functools.partial(_cho_solve_kernel, n=n, w=w),
        grid=(P1 // t1, P2 // t2),
        in_specs=[spec(n), spec(w)],
        out_specs=spec(w),
        out_shape=jax.ShapeDtypeStruct(B.shape, B.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * w * P1 * P2,
            bytes_accessed=4 * P1 * P2 * (n * n + 2 * n * w),
            transcendentals=0,
        ),
    )(L, B)


@functools.partial(jax.jit, static_argnames=("interpret", "t1"))
def plu_solve_multi(A: jax.Array, *Bs, interpret=False, t1: int = T1):
    """Solve ``A X_r = B_r`` for every RHS on planes blocks via ONE fused
    unpivoted LU (the parallel-scan combine's ``I + C J`` solve with its
    matrix and vector right-hand sides passed separately — no stacked-RHS
    concat). Every ``B_r`` is donated."""
    n, _, P1, P2 = A.shape
    t2 = min(T2, P2)
    spec = lambda c: pl.BlockSpec((n, c, t1, t2), lambda i, j: (0, 0, i, j))
    nrhs = len(Bs)
    wtot = sum(b.shape[1] for b in Bs)
    return pl.pallas_call(
        functools.partial(_lu_solve_kernel, n=n, nrhs=nrhs),
        grid=(P1 // t1, P2 // t2),
        in_specs=[spec(n)] + [spec(b.shape[1]) for b in Bs],
        out_specs=[spec(b.shape[1]) for b in Bs],
        out_shape=[jax.ShapeDtypeStruct(b.shape, b.dtype) for b in Bs],
        input_output_aliases={1 + r: r for r in range(nrhs)},
        scratch_shapes=[pltpu.VMEM((n, n, t1, t2), A.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * n * P1 * P2 // 3
            + 2 * n * n * wtot * P1 * P2,
            bytes_accessed=4 * P1 * P2 * (n * n + 2 * n * wtot),
            transcendentals=0,
        ),
    )(A, *Bs)


def plu_solve(A: jax.Array, B: jax.Array, *, interpret=False, t1: int = T1):
    """Single-RHS convenience over :func:`plu_solve_multi` (``B`` donated)."""
    return plu_solve_multi(A, B, interpret=interpret, t1=t1)[0]


def _schur3_kernel(*refs, n, m, lam_level, logb, t1):
    """Fused Schur update of one upper level's THREE slabs (lambda/state/
    input) in one pass: the solved-separator operand ``fs`` streams through
    VMEM once instead of once per slab (ndlqr_UpdateShurFactor applied to
    all three factor blocks, nested_dissection.c:154-171)."""
    al, ax, au, b_ref, cl, cx, cu, ol, ox, ou = refs

    i0 = pl.program_id(0)
    j0 = pl.program_id(1)
    t2 = ol.shape[-1]
    P2 = t2 * pl.num_programs(1)
    flat = (
        (i0 * t1 + jax.lax.broadcasted_iota(jnp.int32, (t1, t2), 0)) * P2
        + j0 * t2
        + jax.lax.broadcasted_iota(jnp.int32, (t1, t2), 1)
    )
    knots = flat >> logb
    halfspan = 1 << lam_level
    span = 2 << lam_level
    keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
    sep = (knots & (span - 1)) == halfspan

    def rows(a_ref, c_ref, o_ref, p, lam):
        def body(i, _):
            acc = b_ref[0] * a_ref[i, 0][None]
            for k in range(1, n):
                acc = acc + b_ref[k] * a_ref[i, k][None]
            if lam:
                v = c_ref[i] - jnp.where(keep[None], acc, 0.0)
                o_ref[i] = jnp.where(sep[None], b_ref[i], v)
            else:
                o_ref[i] = c_ref[i] - acc
            return 0

        jax.lax.fori_loop(0, p, body, 0)

    rows(al, cl, ol, n, True)
    rows(ax, cx, ox, n, False)
    rows(au, cu, ou, m, False)


@functools.partial(
    jax.jit, static_argnames=("level", "logb", "interpret", "t1")
)
def schur3_update_planes(
    FLl, FLx, FLu, fs_full, Cl, Cx, Cu, *, level, logb, interpret=False,
    t1: int = T1,
):
    """One fused pass updating an upper level's lambda/state/input slabs:

      l' = where(sep+1, fs, l - where(calc_lambda, FLl @ fs, 0))
      x' = x - FLx @ fs;   u' = u - FLu @ fs

    FL slabs are [p, n, P1, P2]; ``fs_full``/C slabs carry ``q`` block
    columns (q = n for the factor sweep, q = 1 for the RHS sweep's
    vectors). The three C slabs are donated."""
    n = FLl.shape[0]
    m = FLu.shape[0]
    q = fs_full.shape[1]
    P1, P2 = FLl.shape[-2:]
    t2 = min(T2, P2)
    spec = lambda p, c: pl.BlockSpec(
        (p, c, t1, t2), lambda i, j: (0, 0, i, j)
    )
    kernel = functools.partial(
        _schur3_kernel, n=n, m=m, lam_level=level, logb=logb, t1=t1
    )
    F = P1 * P2
    return pl.pallas_call(
        kernel,
        grid=(P1 // t1, P2 // t2),
        in_specs=[
            spec(n, n), spec(n, n), spec(m, n), spec(n, q),
            spec(n, q), spec(n, q), spec(m, q),
        ],
        out_specs=[spec(n, q), spec(n, q), spec(m, q)],
        out_shape=[
            jax.ShapeDtypeStruct(Cl.shape, Cl.dtype),
            jax.ShapeDtypeStruct(Cx.shape, Cx.dtype),
            jax.ShapeDtypeStruct(Cu.shape, Cu.dtype),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * n + m) * n * n * F,
            bytes_accessed=4 * F * n * (3 * (2 * n + m) + n),
            transcendentals=0,
        ),
    )(FLl, FLx, FLu, fs_full, Cl, Cx, Cu)

"""Batched small-block linear algebra in batch-last ("struct of arrays") layout.

TPU-native counterpart of the reference's ``src/linalg_custom.{h,c}`` ("clap")
and ``src/matmul.{h,c}`` (AVX2 micro-kernels). The reference hand-vectorizes
*within* one tiny matrix using 4-wide AVX2 FMA (matmul.c:31-344); on TPU the
tiny block dims (n=6, m=3) can never fill a 128-lane register, so the roles
flip: the **batch** axis is the vector axis.

Block arrays have shape ``[..., p, q, B]`` with the batch dimension(s) LAST so
XLA lays ``B`` out along the 128-wide lanes. Every kernel below unrolls the
tiny block dims into elementwise [..., B] vector ops (VPU-friendly,
pad-free), exactly like the reference unrolls its 4x4/8x8 kernels into scalar
FMA chains (matmul.c:84-574). Batched dense Cholesky of [B, 6, 6] via XLA's
custom call pads each block to (8, 128) tiles — a 28x memory blowup that this
layout eliminates.

All kernels are shape-polymorphic in the leading (...) grid dims and the
trailing batch dims (which may be empty — single-problem use works too).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Block-dim threshold between the two lowering strategies: at or below it,
# tiny-block ops unroll into elementwise lane-vector math (VPU); above it,
# blocks are big enough to matmul on the MXU via dot_general with the batch
# as a dot batch dimension (e.g. the quadruped-scale nx=36 config, where
# unrolling 36^3 scalar ops would explode the program).
MXU_BLOCK_THRESHOLD = 8

# Per-call override of the dispatch threshold (trace-time): solver entry
# points set this from their resolved SolveOptions so a per-call
# ``SolveOptions(mxu_block_threshold=...)`` steers BOTH the solver-level
# layout routing and linalg's internal small-block/MXU branch (they
# previously could disagree — the options value only reached the routing).
_THRESHOLD_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "rslqr_mxu_threshold", default=None
)


def small_block_threshold() -> int:
    """The active small-block/MXU dispatch point (override or global)."""
    t = _THRESHOLD_OVERRIDE.get()
    return MXU_BLOCK_THRESHOLD if t is None else t


@contextlib.contextmanager
def block_threshold(n: Optional[int]):
    """Scope a dispatch-threshold override (used by solver entry points to
    thread ``SolveOptions.mxu_block_threshold`` down to every linalg call
    traced inside)."""
    if n is None:
        yield
        return
    tok = _THRESHOLD_OVERRIDE.set(n)
    try:
        yield
    finally:
        _THRESHOLD_OVERRIDE.reset(tok)


# Pallas kernel mode for the mid-block planes gemm (ops/planes_pallas.py),
# threaded from SolveOptions.pallas the same way as the threshold:
# "auto" = compiled kernels on TPU / XLA elsewhere, "on" = compiled
# everywhere applicable, "interpret" = interpreter mode (CPU tests),
# "off" = XLA lowerings only.
_PALLAS_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "rslqr_pallas_mode", default=None
)


def pallas_mode() -> str:
    return _PALLAS_OVERRIDE.get() or "auto"


@contextlib.contextmanager
def pallas_ctx(mode: Optional[str]):
    """Scope the Pallas dispatch mode for linalg's mid-block kernels."""
    if mode is None:
        yield
        return
    tok = _PALLAS_OVERRIDE.set(mode)
    try:
        yield
    finally:
        _PALLAS_OVERRIDE.reset(tok)


def _planes_interpret() -> Optional[bool]:
    """Resolve the planes-kernel dispatch: False = compiled, True =
    interpret, None = don't use the kernel."""
    mode = pallas_mode()
    if mode == "off":
        return None
    if mode == "interpret":
        return True
    if mode == "on":
        return False
    return False if jax.default_backend() == "tpu" else None


def _planes_args_ok(arrs, nbatch: int, interp) -> bool:
    """Flat batch-last operands with a (8x128)-tileable common plane?

    Compiled mode additionally requires the TRAILING axis to be lane-
    aligned (% 128): otherwise the stored [..., X, B] layout pads B onto
    128 lanes and the flat-plane reshape is a real relayout pass (measured
    2.7x end-to-end on the quadruped config at B=32)."""
    if interp is None:
        return False
    b = arrs[0].shape[2:]
    F = 1
    for s in b:
        F *= s
    if F % 128:
        return False
    if not interp and arrs[0].shape[-1] % 128:
        return False
    for a in arrs:
        if a.ndim != 2 + nbatch or a.shape[2:] != b:
            return False
        if a.dtype != jnp.float32 and not interp:
            return False
    return True


def _pv(x: jax.Array) -> Tuple[jax.Array, int]:
    """[d0, d1, *b] -> ([d0, d1, R, 128], rows): the flat planes view,
    row-padded to a multiple of the (8, 128) f32 tile. Sub-tile planes
    (deep tree levels / short scan segments) would otherwise fall back to
    the unrolled XLA paths — thousands of tiny ops that dominate dispatch
    AND compile time. Padded plane elements never mix with real ones (the
    kernels are elementwise over the plane), so garbage there is sliced
    off harmlessly."""
    F = 1
    for s in x.shape[2:]:
        F *= s
    rows = F // 128
    p = x.reshape(x.shape[0], x.shape[1], rows, 128)
    R = -(-rows // 8) * 8
    if R != rows:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, R - rows), (0, 0)))
    return p, rows


def _unpv(p: jax.Array, rows: int, shape) -> jax.Array:
    return p[:, :, :rows, :].reshape(shape)


def _pvv(x: jax.Array) -> Tuple[jax.Array, int]:
    """Block-vector twin of :func:`_pv`: ``[p, *b] -> ([p, R, 128], rows)``."""
    F = 1
    for s in x.shape[1:]:
        F *= s
    rows = F // 128
    p = x.reshape(x.shape[0], rows, 128)
    R = -(-rows // 8) * 8
    if R != rows:
        p = jnp.pad(p, ((0, 0), (0, R - rows), (0, 0)))
    return p, rows


def _planes_chol_maybe(A: jax.Array, nbatch: int) -> Optional[jax.Array]:
    """Fused planes Cholesky kernel when applicable (see planes_pallas)."""
    interp = _planes_interpret()
    if not _planes_args_ok((A,), nbatch, interp) or A.shape[0] > 64:
        return None
    from .ops.planes_pallas import pchol

    p, rows = _pv(A)
    return _unpv(pchol(p, interpret=interp), rows, A.shape)


def _planes_cho_solve_maybe(L, B, nbatch: int) -> Optional[jax.Array]:
    interp = _planes_interpret()
    if not _planes_args_ok((L, B), nbatch, interp) or L.shape[0] > 64:
        return None
    from .ops.planes_pallas import pcho_solve

    lp, rows = _pv(L)
    bp, _ = _pv(B)
    return _unpv(pcho_solve(lp, bp, interpret=interp), rows, B.shape)


def _planes_lu_solve_maybe(A, B, nbatch: int) -> Optional[jax.Array]:
    interp = _planes_interpret()
    if not _planes_args_ok((A, B), nbatch, interp) or A.shape[0] > 64:
        return None
    from .ops.planes_pallas import plu_solve

    ap, rows = _pv(A)
    bp, _ = _pv(B)
    return _unpv(plu_solve(ap, bp, interpret=interp), rows, B.shape)


def _planes_gemm_maybe(
    A: jax.Array, B: jax.Array, nbatch: int
) -> Optional[jax.Array]:
    """The element-plane Pallas gemm (ops/planes_pallas.py) when the
    operands are flat batch-last slabs with a (8x128)-tileable plane;
    ``None`` when not applicable (caller picks its fallback).
    ``A``: [.., p, K, *b]; ``B``: [.., K, q, *b]."""
    interp = _planes_interpret()
    if not _planes_args_ok((A, B), nbatch, interp):
        return None
    bshape = A.shape[2:]
    from .ops.planes_pallas import pgemm

    p, K = A.shape[:2]
    q = B.shape[1]
    ap, rows = _pv(A)
    bp, _ = _pv(B)
    out = pgemm(ap, bp, interpret=interp)
    return _unpv(out, rows, (p, q) + bshape)


def bgemm(A: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Batched block matmul: ``[..., p, q, *b] @ [..., q, r, *b] -> [..., p, r, *b]``.

    ``nbatch`` is the number of trailing batch axes (0 for single problem).
    Small blocks lower as broadcast-multiply-reduce over the tiny contraction
    axis so the batch stays in the lane dimension; large blocks go to
    ``dot_general`` (MXU) with the batch axes as dot batch dims.
    """
    q = A.shape[-(nbatch + 1)]
    if q > small_block_threshold():
        # Mid/large blocks: the element-plane Pallas kernel when the shapes
        # fit (flat batch-last slabs — one fused HBM pass at full lane
        # occupancy), else MXU dot_general (batch axes as dot batch dims).
        # A lane-major XLA reduce formulation was tried for batch-last
        # mid-blocks and lost: XLA materializes the 5-D multiply-reduce
        # temps (2-4x padded), OOMing the quadruped config.
        if nbatch >= 1:
            out = _planes_gemm_maybe(A, B, nbatch)
            if out is not None:
                return out
        return _bgemm_mxu(A, B, nbatch)
    # A: [..., p, q, *b] -> [..., p, q, 1, *b]
    # B: [..., q, r, *b] -> [..., 1, q, r, *b]
    # XLA fuses the broadcast-multiply-reduce into one pass; an unrolled
    # q-term accumulation chain was measured ~25% SLOWER on TPU (worse
    # scheduling), so keep the reduce formulation.
    q_axis = -(nbatch + 1)  # the contraction axis position after expansion
    Ae = jnp.expand_dims(A, q_axis)
    Be = jnp.expand_dims(B, -(nbatch + 3))
    return jnp.sum(Ae * Be, axis=-(nbatch + 2))


def _bgemm_mxu(A: jax.Array, B: jax.Array, nbatch: int) -> jax.Array:
    """Large-block path: contraction on the MXU via dot_general.

    Leading grid dims and trailing batch dims both become dot batch
    dimensions (broadcast first if needed); XLA picks MXU-friendly layouts.
    """
    # Broadcast leading grid dims against each other.
    lead = jnp.broadcast_shapes(A.shape[: A.ndim - 2 - nbatch], B.shape[: B.ndim - 2 - nbatch])
    bshape = A.shape[A.ndim - nbatch:]
    A = jnp.broadcast_to(A, lead + A.shape[A.ndim - 2 - nbatch:])
    B = jnp.broadcast_to(B, lead + B.shape[B.ndim - 2 - nbatch:])
    nl = len(lead)
    # A: [*lead, p, q, *b]; B: [*lead, q, r, *b]
    batch_a = tuple(range(nl)) + tuple(range(A.ndim - nbatch, A.ndim))
    batch_b = tuple(range(nl)) + tuple(range(B.ndim - nbatch, B.ndim))
    contract_a = (nl + 1,)
    contract_b = (nl,)
    out = jax.lax.dot_general(
        A, B, ((contract_a, contract_b), (batch_a, batch_b)),
        preferred_element_type=A.dtype,
    )
    # dot_general output: [*lead, *b, p, r] -> [*lead, p, r, *b]
    perm = (
        tuple(range(nl))
        + (out.ndim - 2, out.ndim - 1)
        + tuple(range(nl, nl + nbatch))
    )
    return jnp.transpose(out, perm)


def bgemv(A: jax.Array, x: jax.Array, nbatch: int = 1) -> jax.Array:
    """Batched block mat-vec: ``[..., p, q, *b] @ [..., q, *b] -> [..., p, *b]``."""
    xe = jnp.expand_dims(x, -(nbatch + 2))  # [..., 1, q, *b]
    return jnp.sum(A * xe, axis=-(nbatch + 1))


def bgemm_tt(
    A: jax.Array,
    B: jax.Array,
    nbatch: int = 1,
    *,
    ta: bool = False,
    tbt: bool = False,
    cin: Optional[jax.Array] = None,
    sub: bool = True,
    diag: Optional[jax.Array] = None,
    dconst: float = 0.0,
    sym: bool = False,
    kscale: Optional[jax.Array] = None,
) -> jax.Array:
    """Planes gemm with transpose flags and optional fused epilogues:
    ``op(A) @ op(B)`` or ``cin -/+ op(A) @ op(B)`` (``cin`` is DONATED),
    plus ``diag``/``dconst`` added to the output diagonal and ``sym``
    (symmetric output: only the lower triangle is computed and mirrored;
    ``cin`` must itself be symmetric).

    ``ta``: A stored transposed (``[.., K, p, *b]``); ``tbt``: B stored
    transposed (``[.., q, K, *b]``). On the mid-block element-plane path the
    transposes are free (the kernel reads the flags, ops/planes_pallas.py)
    — a pallas_call cannot fuse an XLA transpose, so pre-transposing an
    operand would cost a full relayout pass; likewise the diagonal adds of
    the scan combines (``I + C J``, ``J + diag(Q)``) fuse into the same
    HBM pass instead of a separate ``.at[diag].add`` slab pass. Falls back
    to explicit block transposes + :func:`bgemm` + XLA epilogues when the
    planes kernel is not applicable.
    """
    interp = _planes_interpret()
    arrs = (A, B) + ((cin,) if cin is not None else ())
    ok = (
        _planes_args_ok(arrs, nbatch, interp)
        and max(A.shape[0], A.shape[1]) > small_block_threshold()
    )
    for v in (diag, kscale):
        if ok and v is not None:
            ok = (
                v.ndim == 1 + nbatch
                and v.shape[1:] == A.shape[2:]
                and (interp or v.dtype == jnp.float32)
            )
    if ok:
        from .ops.planes_pallas import _pgemm_call

        p = A.shape[1] if ta else A.shape[0]
        q = B.shape[0] if tbt else B.shape[1]
        bshape = A.shape[2:]
        ap, rows = _pv(A)
        bp, _ = _pv(B)
        cp = _pv(cin)[0] if cin is not None else None
        dp = _pvv(diag)[0] if diag is not None else None
        kp = _pvv(kscale)[0] if kscale is not None else None
        out = _pgemm_call(
            ap, bp, cp, dp, kp, ta=ta, tbt=tbt, sub=sub, interpret=interp,
            dconst=dconst, sym=sym,
        )
        return _unpv(out, rows, (p, q) + bshape)
    At = transpose_block(A, nbatch) if ta else A
    Bt = transpose_block(B, nbatch) if tbt else B
    if kscale is not None:
        Bt = Bt * jnp.expand_dims(kscale, -(nbatch + 1))
    out = bgemm(At, Bt, nbatch)
    if cin is not None:
        out = cin - out if sub else cin + out
    if diag is not None or dconst:
        p = out.shape[-(nbatch + 2)]
        idx = (Ellipsis, jnp.arange(p), jnp.arange(p)) + (
            slice(None),
        ) * nbatch
        if diag is not None:
            out = out.at[idx].add(diag)
        if dconst:
            out = out.at[idx].add(dconst)
    return out


def _to_mat_last(A: jax.Array, nbatch: int) -> jax.Array:
    """[..., p, q, *b] -> [..., *b, p, q] for lax.linalg batched ops."""
    nd = A.ndim
    perm = (
        tuple(range(nd - nbatch - 2))
        + tuple(range(nd - nbatch, nd))
        + (nd - nbatch - 2, nd - nbatch - 1)
    )
    return jnp.transpose(A, perm)


def _from_mat_last(A: jax.Array, nbatch: int) -> jax.Array:
    """Inverse of :func:`_to_mat_last`."""
    nd = A.ndim
    perm = (
        tuple(range(nd - nbatch - 2))
        + (nd - 2, nd - 1)
        + tuple(range(nd - nbatch - 2, nd - 2))
    )
    return jnp.transpose(A, perm)


def bcholesky(A: jax.Array, nbatch: int = 1) -> jax.Array:
    """Batched Cholesky of SPD blocks ``[..., n, n, *b]`` -> lower ``L``.

    Small blocks: unrolled Cholesky–Banachiewicz over the (static, tiny)
    block dim — every operation an elementwise op on ``[..., *b]`` lane
    vectors (the reference's unblocked factorization, linalg_custom.c:88-111,
    plays the same role for its scalar backend). Large blocks: XLA's batched
    Cholesky with the block dims moved last.
    """
    n = A.shape[-(nbatch + 2)]
    if n > small_block_threshold():
        # XLA TPU's batched Cholesky custom call serializes per column
        # (~4 GFLOP/s measured at batched 36x36). Preferred: the fused
        # element-plane kernel (one HBM pass, O(1) XLA ops); fallback:
        # blocked panel factorizations (gemm bulk). Mat-last (nbatch == 0,
        # the vmap world) uses the mat-last variant.
        if nbatch == 0:
            return _from_mat_last(cholesky_ml(_to_mat_last(A, nbatch)), nbatch)
        out = _planes_chol_maybe(A, nbatch)
        if out is not None:
            return out
        return _cholesky_bl_blocked(A, nbatch)
    return _bcholesky_unrolled(A, nbatch)


def _bcholesky_unrolled(A: jax.Array, nbatch: int) -> jax.Array:
    """Unrolled Cholesky-Banachiewicz lane kernel (any block size; callers
    keep it panel-sized)."""
    n = A.shape[-(nbatch + 2)]

    def at(M, i, j):
        idx = (Ellipsis, i, j) + (slice(None),) * nbatch
        return M[idx]

    cols = [[None] * n for _ in range(n)]
    for j in range(n):
        s = at(A, j, j)
        for k in range(j):
            s = s - cols[j][k] * cols[j][k]
        ljj = jnp.sqrt(s)
        inv = 1.0 / ljj
        cols[j][j] = ljj
        for i in range(j + 1, n):
            s = at(A, i, j)
            for k in range(j):
                s = s - cols[i][k] * cols[j][k]
            cols[i][j] = s * inv
    zero = jnp.zeros_like(at(A, 0, 0))
    rows = [
        jnp.stack([cols[i][j] if j <= i else zero for j in range(n)], axis=-(nbatch + 1))
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-(nbatch + 2))


def btrsm_lower(L: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Solve ``L X = B`` with lower-triangular blocks, unrolled substitution.

    ``L``: [..., n, n, *b]; ``B``: [..., n, r, *b] -> X same shape as B.
    Counterpart of ``clap_LowerTriBackSub`` forward mode
    (linalg_custom.c:113-132). Large blocks use XLA's triangular_solve.
    """
    n = L.shape[-(nbatch + 2)]
    if n > small_block_threshold():
        if nbatch >= 1:
            Lb, Bb = _bcast_blocks(L, B, nbatch)
            return _btrsm_lower_bl_blocked(Lb, Bb, nbatch)
        Lm, Bm = _bcast_mat_last(L, B, nbatch)
        X = jax.lax.linalg.triangular_solve(
            Lm, Bm, left_side=True, lower=True, transpose_a=False
        )
        return _from_mat_last(X, nbatch)
    return _btrsm_lower_unrolled(L, B, nbatch)


def _btrsm_lower_unrolled(L: jax.Array, B: jax.Array, nbatch: int) -> jax.Array:
    n = L.shape[-(nbatch + 2)]

    def at(M, i, j):
        idx = (Ellipsis, i, j) + (slice(None),) * nbatch
        return M[idx]

    def rowvec(M, i):  # [..., r, *b]
        idx = (Ellipsis, i, slice(None)) + (slice(None),) * nbatch
        return M[idx]

    xs = []
    for i in range(n):
        s = rowvec(B, i)
        for k in range(i):
            s = s - jnp.expand_dims(at(L, i, k), -(nbatch + 1)) * xs[k]
        xs.append(s / jnp.expand_dims(at(L, i, i), -(nbatch + 1)))
    return jnp.stack(xs, axis=-(nbatch + 2))


def btrsm_lower_t(L: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Solve ``L' X = B`` (transposed lower = upper), unrolled back-substitution."""
    n = L.shape[-(nbatch + 2)]
    if n > small_block_threshold():
        if nbatch >= 1:
            Lb, Bb = _bcast_blocks(L, B, nbatch)
            return _btrsm_lower_t_bl_blocked(Lb, Bb, nbatch)
        Lm, Bm = _bcast_mat_last(L, B, nbatch)
        X = jax.lax.linalg.triangular_solve(
            Lm, Bm, left_side=True, lower=True, transpose_a=True
        )
        return _from_mat_last(X, nbatch)
    return _btrsm_lower_t_unrolled(L, B, nbatch)


def _btrsm_lower_t_unrolled(L: jax.Array, B: jax.Array, nbatch: int) -> jax.Array:
    n = L.shape[-(nbatch + 2)]

    def at(M, i, j):
        idx = (Ellipsis, i, j) + (slice(None),) * nbatch
        return M[idx]

    def rowvec(M, i):
        idx = (Ellipsis, i, slice(None)) + (slice(None),) * nbatch
        return M[idx]

    xs = [None] * n
    for i in reversed(range(n)):
        s = rowvec(B, i)
        for k in range(i + 1, n):
            # (L')[i, k] = L[k, i]
            s = s - jnp.expand_dims(at(L, k, i), -(nbatch + 1)) * xs[k]
        xs[i] = s / jnp.expand_dims(at(L, i, i), -(nbatch + 1))
    return jnp.stack(xs, axis=-(nbatch + 2))


def _bcast_blocks(L: jax.Array, B: jax.Array, nbatch: int):
    """Broadcast leading grid dims of two block arrays (batch-last kept)."""
    lead = jnp.broadcast_shapes(
        L.shape[: L.ndim - 2 - nbatch], B.shape[: B.ndim - 2 - nbatch]
    )
    L = jnp.broadcast_to(L, lead + L.shape[L.ndim - 2 - nbatch:])
    B = jnp.broadcast_to(B, lead + B.shape[B.ndim - 2 - nbatch:])
    return L, B


def _bcast_mat_last(L: jax.Array, B: jax.Array, nbatch: int):
    """Broadcast leading grid dims of L against B; both to mat-last layout."""
    lead = jnp.broadcast_shapes(
        L.shape[: L.ndim - 2 - nbatch], B.shape[: B.ndim - 2 - nbatch]
    )
    L = jnp.broadcast_to(L, lead + L.shape[L.ndim - 2 - nbatch:])
    B = jnp.broadcast_to(B, lead + B.shape[B.ndim - 2 - nbatch:])
    return _to_mat_last(L, nbatch), _to_mat_last(B, nbatch)


def bcho_solve(L: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Solve ``(L L') X = B`` given the Cholesky factor — two substitutions
    (counterpart of clap_CholeskySolve, linalg_custom.c:134-138). Mid-size
    blocks use the fused element-plane kernel when applicable (``B`` may be
    donated there)."""
    n = L.shape[-(nbatch + 2)]
    if n > small_block_threshold() and nbatch >= 1:
        out = _planes_cho_solve_maybe(L, B, nbatch)
        if out is not None:
            return out
    return btrsm_lower_t(L, btrsm_lower(L, B, nbatch), nbatch)


def bcho_solve_vec(L: jax.Array, b: jax.Array, nbatch: int = 1) -> jax.Array:
    """Vector-RHS convenience: ``[..., n, n, *b] \\ [..., n, *b]``."""
    return bcho_solve(L, jnp.expand_dims(b, -(nbatch + 1)), nbatch).squeeze(-(nbatch + 1))


def transpose_block(A: jax.Array, nbatch: int = 1) -> jax.Array:
    """Transpose the block dims of ``[..., p, q, *b]`` -> ``[..., q, p, *b]``."""
    return jnp.swapaxes(A, -(nbatch + 2), -(nbatch + 1))


def normed_difference(A, B) -> jax.Array:
    """Frobenius norm of ``A - B`` (ref MatrixNormedDifference,
    matrix.c:109-123) — the comparison primitive of the reference tests."""
    d = jnp.asarray(A) - jnp.asarray(B)
    return jnp.sqrt(jnp.sum(d * d))


def bsolve(A: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Solve general square block systems ``A X = B`` in batch-last layout.

    ``A``: [..., n, n, *b]; ``B``: [..., n, r, *b]. Unrolled Gauss-Jordan
    elimination with partial pivoting over the tiny (static) block dim; the
    pivot search unrolls into ``jnp.where`` chains so everything stays
    elementwise over the batch lanes. Used for the non-symmetric
    ``(I + C J)`` solves of the associative-scan Riccati combine. Large
    blocks use XLA's batched LU solve instead.
    """
    n = A.shape[-(nbatch + 2)]
    if n > small_block_threshold():
        # XLA's batched LU factor is column-serialized like its Cholesky;
        # route through the fused planes LU kernel when applicable, else
        # the blocked unpivoted LU (sole large-block user is the scan
        # combine's well-conditioned I + C J — see lu_ml).
        if nbatch >= 1:
            out = _planes_lu_solve_maybe(A, B, nbatch)
            if out is not None:
                return out
            Ab, Bb = _bcast_blocks(A, B, nbatch)
            return _solve_bl_blocked(Ab, Bb, nbatch)
        Am, Bm = _bcast_mat_last(A, B, nbatch)
        return _from_mat_last(solve_ml(Am, Bm), nbatch)

    def row(M, i):  # [..., cols, *b]
        idx = (Ellipsis, i, slice(None)) + (slice(None),) * nbatch
        return M[idx]

    # Work on row lists: each row is [..., n(+r), *b].
    arows = [row(A, i) for i in range(n)]
    brows = [row(B, i) for i in range(n)]

    def elem(r, j):  # [..., *b]
        idx = (Ellipsis, j) + (slice(None),) * nbatch
        return r[idx]

    for col in range(n):
        # Partial pivot: among rows col..n-1 pick the largest |A[:, col]|.
        piv_rows_a = [arows[i] for i in range(col, n)]
        piv_rows_b = [brows[i] for i in range(col, n)]
        best_a = piv_rows_a[0]
        best_b = piv_rows_b[0]
        best_mag = jnp.abs(elem(best_a, col))
        for i in range(1, len(piv_rows_a)):
            mag = jnp.abs(elem(piv_rows_a[i], col))
            take = mag > best_mag
            take_r = jnp.expand_dims(take, -(nbatch + 1))
            best_a = jnp.where(take_r, piv_rows_a[i], best_a)
            best_b = jnp.where(take_r, piv_rows_b[i], best_b)
            best_mag = jnp.maximum(best_mag, mag)
        # Swap the chosen pivot row into position `col`: every candidate row
        # that equals the winner (by its col-entry magnitude) is replaced by
        # the old row at `col` exactly once.
        swapped = jnp.zeros(best_mag.shape, bool)
        old_colrow_a, old_colrow_b = arows[col], brows[col]
        for i in range(col, n):
            is_best = (jnp.abs(elem(arows[i], col)) == best_mag) & (~swapped)
            swapped = swapped | is_best
            is_best_r = jnp.expand_dims(is_best, -(nbatch + 1))
            arows[i] = jnp.where(is_best_r, old_colrow_a, arows[i])
            brows[i] = jnp.where(is_best_r, old_colrow_b, brows[i])
        arows[col], brows[col] = best_a, best_b

        inv = 1.0 / elem(arows[col], col)
        inv_r = jnp.expand_dims(inv, -(nbatch + 1))
        arows[col] = arows[col] * inv_r
        brows[col] = brows[col] * inv_r
        for i in range(n):
            if i == col:
                continue
            factor = jnp.expand_dims(elem(arows[i], col), -(nbatch + 1))
            arows[i] = arows[i] - factor * arows[col]
            brows[i] = brows[i] - factor * brows[col]

    return jnp.stack(brows, axis=-(nbatch + 2))


def bsolve_vec(A: jax.Array, b: jax.Array, nbatch: int = 1) -> jax.Array:
    """Vector-RHS general solve: ``[..., n, n, *b] \\ [..., n, *b]``."""
    return bsolve(A, jnp.expand_dims(b, -(nbatch + 1)), nbatch).squeeze(-(nbatch + 1))


def bsolve_multi(A: jax.Array, Bs, nbatch: int = 1):
    """Solve ``A X_i = B_i`` for several right-hand sides with ONE
    factorization. Mid-size blocks use the fused multi-RHS planes LU
    kernel — each ``B_i`` passed separately and donated, so the caller
    skips the stacked-RHS concat and slice-back copies (measured as ~2x
    the useful traffic of the scan combine's solves). Fallback stacks
    and splits. Unpivoted in the mid-block path — same conditioning
    caveat as :func:`blu_factor`."""
    Bs = tuple(Bs)
    n = A.shape[-(nbatch + 2)]
    if n > small_block_threshold() and A.shape[0] <= 64:
        interp = _planes_interpret()
        if _planes_args_ok((A,) + Bs, nbatch, interp):
            from .ops.planes_pallas import plu_solve_multi

            ap, rows = _pv(A)
            bps = [_pv(b)[0] for b in Bs]
            outs = plu_solve_multi(ap, *bps, interpret=interp)
            return tuple(
                _unpv(o, rows, b.shape) for o, b in zip(outs, Bs)
            )
    w_axis = -(nbatch + 1)
    X = bsolve(A, jnp.concatenate(Bs, axis=w_axis), nbatch)
    outs, off = [], 0
    for b in Bs:
        w = b.shape[w_axis]
        idx = (Ellipsis, slice(off, off + w)) + (slice(None),) * nbatch
        outs.append(X[idx])
        off += w
    return tuple(outs)


def blu_factor(A: jax.Array, nbatch: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Unpivoted Doolittle LU of ``[..., n, n, *b]`` blocks, unrolled.

    Returns ``(LU, dinv)``: the packed factorization (unit-diagonal L below,
    U on and above the diagonal) and the reciprocals of U's diagonal
    ``[..., n, *b]`` (computed once so the substitution passes multiply
    instead of divide). No pivoting: intended for well-conditioned blocks
    like the parallel-scan combine's ``I + C J`` (eigenvalues >= 1 since
    ``C``, ``J`` are PSD); general blocks should use :func:`bsolve`.
    """
    n = A.shape[-(nbatch + 2)]

    def at(M, i, j):
        idx = (Ellipsis, i, j) + (slice(None),) * nbatch
        return M[idx]

    lu = [[None] * n for _ in range(n)]
    dinv = [None] * n
    for k in range(n):
        for j in range(k, n):
            s = at(A, k, j)
            for t in range(k):
                s = s - lu[k][t] * lu[t][j]
            lu[k][j] = s
        dinv[k] = 1.0 / lu[k][k]
        for i in range(k + 1, n):
            s = at(A, i, k)
            for t in range(k):
                s = s - lu[i][t] * lu[t][k]
            lu[i][k] = s * dinv[k]
    rows = [
        jnp.stack(lu[i], axis=-(nbatch + 1)) for i in range(n)
    ]
    return (
        jnp.stack(rows, axis=-(nbatch + 2)),
        jnp.stack(dinv, axis=-(nbatch + 1)),
    )


def blu_solve(LU, dinv, B, nbatch: int = 1) -> jax.Array:
    """Solve ``A X = B`` given :func:`blu_factor` output; B ``[..., n, r, *b]``."""
    n = LU.shape[-(nbatch + 2)]

    def at(M, i, j):
        idx = (Ellipsis, i, j) + (slice(None),) * nbatch
        return M[idx]

    def rowvec(M, i):
        idx = (Ellipsis, i, slice(None)) + (slice(None),) * nbatch
        return M[idx]

    def col(v, i):  # [..., *b] -> broadcast over the r axis
        idx = (Ellipsis, i) + (slice(None),) * nbatch
        return jnp.expand_dims(v[idx], -(nbatch + 1))

    # Forward substitution with unit-diagonal L.
    ys = []
    for i in range(n):
        s = rowvec(B, i)
        for k in range(i):
            s = s - jnp.expand_dims(at(LU, i, k), -(nbatch + 1)) * ys[k]
        ys.append(s)
    # Back substitution with U.
    xs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - jnp.expand_dims(at(LU, i, k), -(nbatch + 1)) * xs[k]
        xs[i] = s * col(dinv, i)
    return jnp.stack(xs, axis=-(nbatch + 2))


def blu_solve_t(LU, dinv, B, nbatch: int = 1) -> jax.Array:
    """Solve ``A' X = B`` given :func:`blu_factor` output (``A' = U' L'``)."""
    n = LU.shape[-(nbatch + 2)]

    def at(M, i, j):
        idx = (Ellipsis, i, j) + (slice(None),) * nbatch
        return M[idx]

    def rowvec(M, i):
        idx = (Ellipsis, i, slice(None)) + (slice(None),) * nbatch
        return M[idx]

    def col(v, i):
        idx = (Ellipsis, i) + (slice(None),) * nbatch
        return jnp.expand_dims(v[idx], -(nbatch + 1))

    # U' z = B: lower triangular with U's diagonal; (U')[i,k] = U[k,i].
    zs = []
    for i in range(n):
        s = rowvec(B, i)
        for k in range(i):
            s = s - jnp.expand_dims(at(LU, k, i), -(nbatch + 1)) * zs[k]
        zs.append(s * col(dinv, i))
    # L' x = z: unit upper triangular; (L')[i,k] = L[k,i].
    xs = [None] * n
    for i in reversed(range(n)):
        s = zs[i]
        for k in range(i + 1, n):
            s = s - jnp.expand_dims(at(LU, k, i), -(nbatch + 1)) * xs[k]
        xs[i] = s
    return jnp.stack(xs, axis=-(nbatch + 2))


def beye(n: int, like: jax.Array, nbatch: int = 1) -> jax.Array:
    """Identity block broadcastable against ``[..., n, n, *b]`` arrays."""
    return jnp.eye(n, dtype=like.dtype).reshape((n, n) + (1,) * nbatch)


# ---------------------------------------------------------------------------
# Blocked (panel) factorizations for mid-size blocks, mat-last layout.
#
# XLA TPU's batched Cholesky / LU custom calls serialize per column and run
# at single-digit GFLOP/s for batched 36x36 blocks (measured ~3.7 GF/s vs
# ~700 GF/s for the batched gemm at the same shape) — they are the
# bottleneck of the quadruped-scale configs. These panel algorithms put the
# O(n^3) bulk into batched MXU gemms and run only panel-sized (<= PANEL)
# factorizations through the unrolled lane kernels on cheap transposed
# views. This is the reference's "pick a real backend for every size"
# dispatch (linalg.c:153-190) realized TPU-natively.
#
# All functions below take mat-last arrays ``[*lead, n, n]`` / rhs
# ``[*lead, n, w]`` (the layout vmap produces for the large-block path).
# ---------------------------------------------------------------------------

PANEL = 16


def _em_view(x: jax.Array) -> Tuple[jax.Array, Tuple[int, ...]]:
    """Mat-last panel ``[*lead, p, q] -> ([p, q, Bflat], lead_shape)`` for
    the lane kernels (``lead_shape`` feeds :func:`_ml_view` to invert)."""
    lead = x.shape[:-2]
    p, q = x.shape[-2:]
    return jnp.moveaxis(x.reshape((-1, p, q)), 0, -1), lead


def _ml_view(x: jax.Array, lead) -> jax.Array:
    """Inverse of :func:`_em_view`."""
    p, q = x.shape[:2]
    return jnp.moveaxis(x, -1, 0).reshape(lead + (p, q))


def _panel_chol_ml(A: jax.Array) -> jax.Array:
    em, lead = _em_view(A)
    return _ml_view(_bcholesky_unrolled(em, 1), lead)


def _panel_trsm_lower_ml(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L X = B`` with panel-sized lower ``L`` (mat-last)."""
    Lem, lead = _em_view(L)
    Bem, _ = _em_view(B)
    return _ml_view(_btrsm_lower_unrolled(Lem, Bem, 1), lead)


def _panel_trsm_lower_t_ml(L: jax.Array, B: jax.Array) -> jax.Array:
    Lem, lead = _em_view(L)
    Bem, _ = _em_view(B)
    return _ml_view(_btrsm_lower_t_unrolled(Lem, Bem, 1), lead)


def cholesky_ml(A: jax.Array, panel: int = PANEL) -> jax.Array:
    """Blocked right-looking Cholesky of mat-last SPD ``[*lead, n, n]``.

    Panel factorizations via the unrolled lane kernels; the trailing-matrix
    update (the FLOP bulk) is one batched gemm per panel (MXU).
    """
    n = A.shape[-1]
    if n <= panel:
        return _panel_chol_ml(A)
    strips = []  # per panel k: [*lead, n - k, p] columns of L
    T = A
    k = 0
    while k < n:
        p = min(panel, n - k)
        L11 = _panel_chol_ml(T[..., :p, :p])
        if n - k - p > 0:
            A21t = jnp.swapaxes(T[..., p:, :p], -1, -2)  # [., p, r]
            L21t = _panel_trsm_lower_ml(L11, A21t)       # L11 L21' = A21'
            L21 = jnp.swapaxes(L21t, -1, -2)
            T = T[..., p:, p:] - L21 @ L21t
            strips.append(jnp.concatenate([L11, L21], axis=-2))
        else:
            strips.append(L11)
        k += p
    # Assemble lower-triangular L: pad each strip with zero rows on top.
    cols = []
    off = 0
    for s in strips:
        pad = [(0, 0)] * (s.ndim - 2) + [(off, 0), (0, 0)]
        cols.append(jnp.pad(s, pad))
        off += s.shape[-1]
    return jnp.concatenate(cols, axis=-1)


def trsm_lower_ml(L: jax.Array, B: jax.Array, panel: int = PANEL) -> jax.Array:
    """Solve ``L X = B`` (lower-triangular, mat-last) by panel substitution:
    off-diagonal eliminations are batched gemms."""
    n = L.shape[-1]
    if n <= panel:
        return _panel_trsm_lower_ml(L, B)
    Xs = []
    offs = []
    k = 0
    while k < n:
        p = min(panel, n - k)
        R = B[..., k : k + p, :]
        for j0, Xj in zip(offs, Xs):
            pj = Xj.shape[-2]
            R = R - L[..., k : k + p, j0 : j0 + pj] @ Xj
        Xs.append(_panel_trsm_lower_ml(L[..., k : k + p, k : k + p], R))
        offs.append(k)
        k += p
    return jnp.concatenate(Xs, axis=-2)


def trsm_lower_t_ml(L: jax.Array, B: jax.Array, panel: int = PANEL) -> jax.Array:
    """Solve ``L' X = B`` (mat-last), reverse panel substitution."""
    n = L.shape[-1]
    if n <= panel:
        return _panel_trsm_lower_t_ml(L, B)
    bounds = []
    k = 0
    while k < n:
        p = min(panel, n - k)
        bounds.append((k, p))
        k += p
    Xs = [None] * len(bounds)
    for i in reversed(range(len(bounds))):
        k, p = bounds[i]
        R = B[..., k : k + p, :]
        for j in range(i + 1, len(bounds)):
            kj, pj = bounds[j]
            # (L')[k block, j block] = L[j block, k block]'
            Lblk = jnp.swapaxes(L[..., kj : kj + pj, k : k + p], -1, -2)
            R = R - Lblk @ Xs[j]
        Xs[i] = _panel_trsm_lower_t_ml(L[..., k : k + p, k : k + p], R)
    return jnp.concatenate(Xs, axis=-2)


def lu_ml(A: jax.Array, panel: int = PANEL):
    """Blocked unpivoted LU of mat-last ``[*lead, n, n]``.

    Returns packed ``LU`` (unit-lower below, U on/above the diagonal).
    No pivoting: intended for the well-conditioned ``I + C J`` blocks of
    the parallel-scan combine (eigenvalues >= 1); see :func:`blu_factor`.
    """
    n = A.shape[-1]
    strips_L = []  # [*lead, n-k, p]
    strips_U = []  # [*lead, p, n-k-p] U12 rows
    T = A
    k = 0
    bounds = []
    while k < n:
        p = min(panel, n - k)
        bounds.append((k, p))
        blk = T[..., :p, :p]
        em, lead = _em_view(blk)
        LUp, dinv = blu_factor(em, 1)
        LU11 = _ml_view(LUp, lead)
        r = T.shape[-1] - p
        if r > 0:
            # L21 = A21 U11^{-1}  <=>  U11' L21' = A21' (lower-tri solve
            # with U11's diagonal).
            U11t = jnp.swapaxes(jnp.triu(LU11), -1, -2)
            A21t = jnp.swapaxes(T[..., p:, :p], -1, -2)
            L21 = jnp.swapaxes(_panel_trsm_lower_ml(U11t, A21t), -1, -2)
            # U12 = L11^{-1} A12 (unit-lower solve).
            L11 = jnp.tril(LU11, -1) + jnp.eye(p, dtype=A.dtype)
            U12 = _panel_trsm_lower_ml(L11, T[..., :p, p:])
            T = T[..., p:, p:] - L21 @ U12
            strips_L.append(jnp.concatenate([LU11, L21], axis=-2))
            strips_U.append(U12)
        else:
            strips_L.append(LU11)
            strips_U.append(None)
        k += p
    # Assemble packed LU.
    cols = []
    off = 0
    for s in strips_L:
        pad = [(0, 0)] * (s.ndim - 2) + [(off, 0), (0, 0)]
        cols.append(jnp.pad(s, pad))
        off += s.shape[-1]
    LU = jnp.concatenate(cols, axis=-1)
    off = 0
    for (k0, p), U12 in zip(bounds, strips_U):
        if U12 is not None:
            pad = [(0, 0)] * (U12.ndim - 2) + [(k0, n - k0 - p), (k0 + p, 0)]
            LU = LU + jnp.pad(U12, pad)
        off += p
    return LU


def lu_solve_ml(LU: jax.Array, B: jax.Array, panel: int = PANEL) -> jax.Array:
    """Solve ``A X = B`` given :func:`lu_ml` output (mat-last)."""
    n = LU.shape[-1]
    L = jnp.tril(LU, -1) + jnp.eye(n, dtype=LU.dtype)
    Y = trsm_lower_ml(L, B, panel)
    # U X = Y: U' is lower with U's diagonal -> reuse the reverse-panel
    # transposed solve on U'.
    Ut = jnp.swapaxes(jnp.triu(LU), -1, -2)
    # (U')' X = Y with U' lower  <=>  trsm_lower_t on L := U'.
    return trsm_lower_t_ml_general(Ut, Y, panel)


def trsm_lower_t_ml_general(L: jax.Array, B: jax.Array, panel: int = PANEL):
    """Like :func:`trsm_lower_t_ml` but without assuming a Cholesky factor
    (used for ``U X = Y`` via ``L = U'``)."""
    return trsm_lower_t_ml(L, B, panel)


def solve_ml(A: jax.Array, B: jax.Array, panel: int = PANEL) -> jax.Array:
    """General mat-last solve via blocked unpivoted LU (see :func:`lu_ml`
    for the conditioning caveat)."""
    return lu_solve_ml(lu_ml(A, panel), B, panel)


# ---------------------------------------------------------------------------
# Blocked (panel) factorizations in BATCH-LAST layout.
#
# For natively-batched arrays ``[..., n, n, *b]`` (instances on the lane
# axis) the mat-last algorithms above would park the tiny block dims on the
# (sublane, lane) tiles: a 36x36 block occupies 36/128 lanes — a 3.6x
# bandwidth tax on every op. These variants keep the batch on the lanes:
# panels run the unrolled lane kernels DIRECTLY (no transposes), and the
# O(n^3) bulk is the broadcast-multiply-reduce gemm (VPU at full lane
# occupancy). This is the production path for mid-size blocks with
# nbatch >= 1; nbatch == 0 (the vmap world) uses the mat-last versions.
# ---------------------------------------------------------------------------


def _blk(x: jax.Array, r0, r1, c0, c1, nbatch: int) -> jax.Array:
    idx = (Ellipsis, slice(r0, r1), slice(c0, c1)) + (slice(None),) * nbatch
    return x[idx]


def _bgemm_reduce(A: jax.Array, B: jax.Array, nbatch: int) -> jax.Array:
    """Mid-block gemm for the blocked batch-last factorizations: the
    element-plane Pallas kernel when applicable, else the lane-major
    broadcast-multiply-reduce formulation (fine for panel-sized leftovers;
    pathological only at slab scale, which the kernel covers)."""
    out = _planes_gemm_maybe(A, B, nbatch)
    if out is not None:
        return out
    q_axis = -(nbatch + 1)
    Ae = jnp.expand_dims(A, q_axis)
    Be = jnp.expand_dims(B, -(nbatch + 3))
    return jnp.sum(Ae * Be, axis=-(nbatch + 2))


def _cholesky_bl_blocked(A: jax.Array, nbatch: int, panel: int = PANEL):
    """Blocked right-looking Cholesky, batch-last ``[..., n, n, *b]``."""
    n = A.shape[-(nbatch + 2)]
    ra, ca = -(nbatch + 2), -(nbatch + 1)
    strips = []
    T = A
    k = 0
    while k < n:
        p = min(panel, n - k)
        r = T.shape[ra] - p
        L11 = _bcholesky_unrolled(_blk(T, 0, p, 0, p, nbatch), nbatch)
        if r > 0:
            A21t = transpose_block(_blk(T, p, p + r, 0, p, nbatch), nbatch)
            L21t = _btrsm_lower_unrolled(L11, A21t, nbatch)  # [., p, r, *b]
            L21 = transpose_block(L21t, nbatch)
            T = _blk(T, p, p + r, p, p + r, nbatch) - _bgemm_reduce(
                L21, L21t, nbatch
            )
            strips.append(jnp.concatenate([L11, L21], axis=ra))
        else:
            strips.append(L11)
        k += p
    cols = []
    off = 0
    for s in strips:
        pad = [(0, 0)] * s.ndim
        pad[ra] = (off, 0)
        cols.append(jnp.pad(s, pad))
        off += s.shape[ca]
    return jnp.concatenate(cols, axis=ca)


def _panel_bounds(n: int, panel: int):
    out = []
    k = 0
    while k < n:
        p = min(panel, n - k)
        out.append((k, p))
        k += p
    return out


def _btrsm_lower_bl_blocked(L, B, nbatch: int, panel: int = PANEL):
    """Solve ``L X = B`` (batch-last) by panel substitution; eliminations
    are lane-major gemms."""
    n = L.shape[-(nbatch + 2)]
    ra = -(nbatch + 2)
    Xs, offs = [], []
    for k, p in _panel_bounds(n, panel):
        R = _blk(B, k, k + p, 0, B.shape[-(nbatch + 1)], nbatch)
        for (j0, pj), Xj in zip(offs, Xs):
            R = R - _bgemm_reduce(_blk(L, k, k + p, j0, j0 + pj, nbatch), Xj, nbatch)
        Xs.append(
            _btrsm_lower_unrolled(_blk(L, k, k + p, k, k + p, nbatch), R, nbatch)
        )
        offs.append((k, p))
    return jnp.concatenate(Xs, axis=ra)


def _btrsm_lower_t_bl_blocked(L, B, nbatch: int, panel: int = PANEL):
    """Solve ``L' X = B`` (batch-last), reverse panel substitution."""
    n = L.shape[-(nbatch + 2)]
    ra = -(nbatch + 2)
    w = B.shape[-(nbatch + 1)]
    bounds = _panel_bounds(n, panel)
    Xs = [None] * len(bounds)
    for i in reversed(range(len(bounds))):
        k, p = bounds[i]
        R = _blk(B, k, k + p, 0, w, nbatch)
        for j in range(i + 1, len(bounds)):
            kj, pj = bounds[j]
            Lblk = transpose_block(_blk(L, kj, kj + pj, k, k + p, nbatch), nbatch)
            R = R - _bgemm_reduce(Lblk, Xs[j], nbatch)
        Xs[i] = _btrsm_lower_t_unrolled(
            _blk(L, k, k + p, k, k + p, nbatch), R, nbatch
        )
    return jnp.concatenate(Xs, axis=ra)


def _lu_bl_blocked(A: jax.Array, nbatch: int, panel: int = PANEL):
    """Blocked unpivoted LU, batch-last. Returns packed LU (same
    conditioning caveat as :func:`lu_ml`)."""
    n = A.shape[-(nbatch + 2)]
    ra, ca = -(nbatch + 2), -(nbatch + 1)
    dtype = A.dtype
    bounds = _panel_bounds(n, panel)
    strips_L, strips_U = [], []
    T = A
    for k, p in bounds:
        r = T.shape[ra] - p
        blk = _blk(T, 0, p, 0, p, nbatch)
        LUp, _ = blu_factor(blk, nbatch)
        if r > 0:
            eye = beye(p, A, nbatch)
            tri_shape = (p, p) + (1,) * nbatch
            upper_mask = jnp.triu(jnp.ones((p, p), bool)).reshape(tri_shape)
            U11 = jnp.where(upper_mask, LUp, 0.0)
            L11 = jnp.where(upper_mask, 0.0, LUp) + eye
            A21t = transpose_block(_blk(T, p, p + r, 0, p, nbatch), nbatch)
            # L21 = A21 U11^{-1}  <=>  U11' L21' = A21'.
            L21 = transpose_block(
                _btrsm_lower_unrolled(transpose_block(U11, nbatch), A21t, nbatch),
                nbatch,
            )
            U12 = _btrsm_lower_unrolled(
                L11, _blk(T, 0, p, p, p + r, nbatch), nbatch
            )
            T = _blk(T, p, p + r, p, p + r, nbatch) - _bgemm_reduce(
                L21, U12, nbatch
            )
            strips_L.append(jnp.concatenate([LUp, L21], axis=ra))
            strips_U.append(U12)
        else:
            strips_L.append(LUp)
            strips_U.append(None)
    cols = []
    off = 0
    for s in strips_L:
        pad = [(0, 0)] * s.ndim
        pad[ra] = (off, 0)
        cols.append(jnp.pad(s, pad))
        off += s.shape[ca]
    LU = jnp.concatenate(cols, axis=ca)
    for (k0, p), U12 in zip(bounds, strips_U):
        if U12 is not None:
            pad = [(0, 0)] * U12.ndim
            pad[ra] = (k0, n - k0 - p)
            pad[ca] = (k0 + p, 0)
            LU = LU + jnp.pad(U12, pad)
    return LU


def _lu_solve_bl_blocked(LU, B, nbatch: int, panel: int = PANEL):
    n = LU.shape[-(nbatch + 2)]
    tri_shape = (n, n) + (1,) * nbatch
    upper_mask = jnp.triu(jnp.ones((n, n), bool)).reshape(tri_shape)
    L = jnp.where(upper_mask, 0.0, LU) + beye(n, LU, nbatch)
    U = jnp.where(upper_mask, LU, 0.0)
    Y = _btrsm_lower_bl_blocked(L, B, nbatch, panel)
    # U X = Y via the transposed-lower reverse substitution on U'.
    return _btrsm_lower_t_bl_blocked(transpose_block(U, nbatch), Y, nbatch, panel)


def _solve_bl_blocked(A, B, nbatch: int, panel: int = PANEL):
    return _lu_solve_bl_blocked(_lu_bl_blocked(A, nbatch, panel), B, nbatch, panel)

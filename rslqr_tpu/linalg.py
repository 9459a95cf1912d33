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

from typing import Tuple

import jax
import jax.numpy as jnp


def bgemm(A: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Batched block matmul: ``[..., p, q, *b] @ [..., q, r, *b] -> [..., p, r, *b]``.

    ``nbatch`` is the number of trailing batch axes (0 for single problem).
    Lowered as broadcast-multiply-reduce over the tiny contraction axis so the
    batch stays in the lane dimension; XLA fuses the whole thing.
    """
    # A: [..., p, q, *b] -> [..., p, q, 1, *b]
    # B: [..., q, r, *b] -> [..., 1, q, r, *b]
    q_axis = -(nbatch + 1)  # the contraction axis position after expansion
    Ae = jnp.expand_dims(A, q_axis)
    Be = jnp.expand_dims(B, -(nbatch + 3))
    return jnp.sum(Ae * Be, axis=-(nbatch + 2))


def bgemv(A: jax.Array, x: jax.Array, nbatch: int = 1) -> jax.Array:
    """Batched block mat-vec: ``[..., p, q, *b] @ [..., q, *b] -> [..., p, *b]``."""
    xe = jnp.expand_dims(x, -(nbatch + 2))  # [..., 1, q, *b]
    return jnp.sum(A * xe, axis=-(nbatch + 1))


def bcholesky(A: jax.Array, nbatch: int = 1) -> jax.Array:
    """Batched Cholesky of SPD blocks ``[..., n, n, *b]`` -> lower ``L``.

    Unrolled Cholesky–Banachiewicz over the (static, tiny) block dim: every
    operation is an elementwise op on ``[..., *b]`` vectors. The reference's
    unblocked right-looking factorization (linalg_custom.c:88-111) plays the
    same role for its scalar backend.
    """
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
    (linalg_custom.c:113-132).
    """
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


def bcho_solve(L: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Solve ``(L L') X = B`` given the Cholesky factor — two substitutions
    (counterpart of clap_CholeskySolve, linalg_custom.c:134-138)."""
    return btrsm_lower_t(L, btrsm_lower(L, B, nbatch), nbatch)


def bcho_solve_vec(L: jax.Array, b: jax.Array, nbatch: int = 1) -> jax.Array:
    """Vector-RHS convenience: ``[..., n, n, *b] \\ [..., n, *b]``."""
    return bcho_solve(L, jnp.expand_dims(b, -(nbatch + 1)), nbatch).squeeze(-(nbatch + 1))


def transpose_block(A: jax.Array, nbatch: int = 1) -> jax.Array:
    """Transpose the block dims of ``[..., p, q, *b]`` -> ``[..., q, p, *b]``."""
    return jnp.swapaxes(A, -(nbatch + 2), -(nbatch + 1))


def bsolve(A: jax.Array, B: jax.Array, nbatch: int = 1) -> jax.Array:
    """Solve general square block systems ``A X = B`` in batch-last layout.

    ``A``: [..., n, n, *b]; ``B``: [..., n, r, *b]. Unrolled Gauss-Jordan
    elimination with partial pivoting over the tiny (static) block dim; the
    pivot search unrolls into ``jnp.where`` chains so everything stays
    elementwise over the batch lanes. Used for the non-symmetric
    ``(I + C J)`` solves of the associative-scan Riccati combine.
    """
    n = A.shape[-(nbatch + 2)]

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


def beye(n: int, like: jax.Array, nbatch: int = 1) -> jax.Array:
    """Identity block broadcastable against ``[..., n, n, *b]`` arrays."""
    return jnp.eye(n, dtype=like.dtype).reshape((n, n) + (1,) * nbatch)

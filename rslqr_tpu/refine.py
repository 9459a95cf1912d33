"""Mixed-precision iterative refinement: f32 factorization, f64 accuracy.

The reference achieves its 1e-6 / 1e-10 accuracy bars by running everything
in double precision — natural on CPU, slow on TPU where f64 is emulated.
The TPU-native play is classic mixed-precision refinement: factor and solve
in fast float32 (the heavy O(N log^2 N) block work), then iterate

    r = b - K s            (KKT residual, evaluated in float64 — cheap
                            matvecs over the trajectory)
    delta = K_f32^{-1} r   (re-solve with the cached f32 factorization —
                            the multi-RHS path, no re-factorization)
    s <- s + delta

Each iteration multiplies the error by O(kappa * eps_f32), so 2-3 iterations
reach f64-limited accuracy for well-conditioned LQR problems while doing
only O(N) f64 work per iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import rslqr
from .problem import LQRProblem
from .tree import TreeTables, build_tree_tables


def kkt_apply(prob: LQRProblem, Y, X, U):
    """Apply the KKT matrix to ``(Y [N,n,*b], X, U [N,m,*b])``, batch-last.

    Block rows (variable ordering solve.h:50-53; matrix structure
    solver.c:122-190):

      y-row k=0:   -x_0
      y-row k>=1:  A_{k-1} x_{k-1} + B_{k-1} u_{k-1} - x_k
      x-row k<N-1: -y_k + Q_k x_k + A_k' y_{k+1}
      x-row N-1:   -y_{N-1} + Q_{N-1} x_{N-1}
      u-row k<N-1: R_k u_k + B_k' y_{k+1}
    """
    nb = prob.A.ndim - 3
    A, B = prob.A[:-1], prob.B[:-1]

    def mv(M, v):  # [K,p,q,*b] @ [K,q,*b]
        return jnp.sum(M * jnp.expand_dims(v, -(nb + 2)), axis=-(nb + 1))

    def mtv(M, v):  # M' @ v
        return jnp.sum(M * jnp.expand_dims(v, -(nb + 1)), axis=-(nb + 2))

    My = jnp.concatenate(
        [-X[:1], mv(A, X[:-1]) + mv(B, U[:-1]) - X[1:]], axis=0
    )
    Mx = -Y + prob.Qdiag * X
    Mx = Mx.at[:-1].add(mtv(A, Y[1:]))
    Mu = prob.Rdiag * U
    Mu = Mu.at[:-1].add(mtv(B, Y[1:]))
    return My, Mx, Mu


def kkt_rhs(prob: LQRProblem):
    """The packed KKT right-hand side ``-[x0; q0; r0; f0; q1; ...]``
    (ref solver.c:138-190), in (y, x, u) block form, batch-last."""
    by = jnp.concatenate([-prob.x0[None], -prob.f[:-1]], axis=0)
    return by, -prob.q, -prob.r


def solve_refined(
    prob: LQRProblem,
    iterations: int = 2,
    solve_dtype=jnp.float32,
    tables: Optional[TreeTables] = None,
) -> rslqr.RsLqrSolution:
    """rsLQR solve with ``solve_dtype`` factorization refined to the
    precision of ``prob``'s dtype (pass a float64 problem for full accuracy).

    Jittable (needs x64 enabled for f64 refinement); batch axes as usual.
    """
    nb = prob.A.ndim - 3
    t = tables or build_tree_tables(prob.A.shape[-3])

    pbl_hi = rslqr._to_batch_last(prob, nb)
    pbl_lo = pbl_hi.astype(solve_dtype)

    if rslqr._use_em_layout(prob):
        # Element-major production path: factor once, re-solve per iteration
        # through the EM RHS sweep (layout conversions touch vectors only).
        from . import rslqr_em

        A_lo, B_lo = rslqr_em._em(pbl_lo.A), rslqr_em._em(pbl_lo.B)
        fact, rhs_em = rslqr_em.factorize_em(prob.astype(solve_dtype), t)

        def resolve(rhs_bl):
            zy, zx, zu = (rslqr_em._emv(v) for v in rhs_bl)
            for level in range(t.depth):
                zy, zx, zu = rslqr_em._rhs_level_em(
                    A_lo, B_lo, level, fact.Fls[level], fact.Fxs[level],
                    fact.Fus[level], fact.chols[level], zy, zx, zu, nb,
                )
            return tuple(rslqr_em._emv_bl(v) for v in (zy, zx, zu))

        zy, zx, zu = resolve(tuple(rslqr_em._emv_bl(v) for v in rhs_em))
    else:
        fact, rhs_lo = rslqr._factorize_bl(pbl_lo, t, nb)
        zy, zx, zu = rslqr._solve_rhs_bl(pbl_lo, fact, rhs_lo, t)

        def resolve(rhs_bl):
            return rslqr._solve_rhs_bl(pbl_lo, fact, rhs_bl, t)

    hi = prob.A.dtype
    Y, X, U = zy.astype(hi), zx.astype(hi), zu.astype(hi)

    by, bx, bu = kkt_rhs(pbl_hi)
    for _ in range(iterations):
        My, Mx, Mu = kkt_apply(pbl_hi, Y, X, U)
        ry, rx, ru = by - My, bx - Mx, bu - Mu
        # The trailing u block is scratch (no terminal input variable).
        ru = ru.at[-1].set(0.0)
        r_lo = rslqr._leaf_rhs_transform(
            pbl_lo, (ry.astype(solve_dtype), rx.astype(solve_dtype), ru.astype(solve_dtype)), nb
        )
        dy, dx, du = resolve(r_lo)
        Y = Y + dy.astype(hi)
        X = X + dx.astype(hi)
        U = U + du.astype(hi)

    return rslqr.RsLqrSolution(
        Y=rslqr._bf(Y, nb),
        X=rslqr._bf(X, nb),
        U=rslqr._bf(U[:-1], nb),
        fact=fact,
    )

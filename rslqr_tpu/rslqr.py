"""rsLQR — recursive Schur-complement (nested dissection) LQR solver.

TPU-native re-design of the reference's ``src/{solver,solve,nested_dissection,
nddata,cholesky_factors}.{h,c}``. This is NOT a port; the mapping is:

  reference (C + OpenMP)                      this module (JAX/XLA)
  ------------------------------------------  --------------------------------
  NdData pointer grid of per-block Matrix     dense stacked arrays
    views (nddata.c:31-53)                      ``[depth, N, n, ·]``
  ``data`` NdData holding A', B', -I, 0       nothing — the blocks are purely
    blocks (solver.c:146-175)                   structural, so inner products
                                                read ``A``/``B`` directly
  per-leaf dense Cholesky of diagonal Q, R    elementwise reciprocals (Q and R
    (nested_dissection.c:40,58,65,77)           are diagonal by construction)
  CholeskyInfo cache (cholesky_factors.c)     per-level stacked Cholesky
                                                factors carried functionally
  OpenMP parallel-for + barriers over leaves  one batched op per stage; the
    (solve.c:50-183)                            level loop is unrolled (depth
                                                = log2 N <= ~10) and XLA
                                                parallelizes within each op
  pointer-walk tree queries (binary_tree.c)   precomputed constant index
                                                tables (rslqr_tpu.tree)

Everything is pure: ``solve(prob)`` is jittable, vmappable over batches of
problems, and differentiable. Algorithm reference: docs/rslqr.dox:65-138.

Math per level L (numleaves = 2^(depth-L-1), node idx = 2^L(2j+1)-1):

  1. inner products  (ref nested_dissection.c:114-134, solve.c:71-83):
       for fact_level u in [L, depth):
         Flambda[u, idx+1] <- A[idx] @ Fstate[u, idx] + B[idx] @ Finput[u, idx]
                              - Fstate[u, idx+1] - Flambda[u, idx+1]
     (the C1/C2 "data" blocks are A', B' at knot idx and -I, 0 at idx+1;
      C' F with C = A' gives A @ F, and the -I block contributes -Fstate)
  2. batched Cholesky of Sbar = Flambda[L, idx+1]     (solve.c:87-98)
  3. Sbar \\ Flambda[u, idx+1] for u in (L, depth)     (solve.c:103-116)
  4. Schur updates for every knot k                    (solve.c:119-131):
       sep = sep_index[k, L]; fmat = Flambda[u, sep+1]
       F*[u, k] -= F*[L, k] @ fmat   (lambda row masked by calc_lambda)

then the same sweep once more against the right-hand side using the cached
Cholesky factors (solve.c:137-182).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .problem import LQRProblem, pack_solution, unpack_solution
from .tree import TreeTables, build_tree_tables


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RsLqrFactorization:
    """The factorization state after the level sweep.

    Attributes:
      Flambda/Fstate/Finput: ``[depth, N, {n,n,m}, n]`` factor grids — the
        functional analogue of the reference's ``fact`` NdData
        (nddata.h:83-93).
      chol: ``[N-1, n, n]`` lower Cholesky factors of every separator Sbar,
        stacked in node order — the analogue of NdLqrCholeskyFactors
        (cholesky_factors.h:30-35). ``chol[idx]`` is the factor for node
        ``idx``; used to re-solve new right-hand sides.
    """

    Flambda: jax.Array
    Fstate: jax.Array
    Finput: jax.Array
    chol: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RsLqrSolution:
    """Solution of one rsLQR solve.

    ``Y``/``X`` are ``[N, n]``, ``U`` is ``[N-1, m]``; ``kkt_vector`` gives
    the flat interleaved layout matching the reference (solve.h:50-53).
    """

    Y: jax.Array
    X: jax.Array
    U: jax.Array
    fact: RsLqrFactorization

    def kkt_vector(self) -> jax.Array:
        return pack_solution(self.Y, self.X, self.U)


def _leaf_solve(prob: LQRProblem, levels: np.ndarray, depth: int):
    """Phase 1: independent per-knot leaf solves (ref nested_dissection.c:10-105).

    Returns the initialized factor grids and RHS vectors. Because Q and R are
    diagonal, every "Cholesky solve" here is an elementwise scale by 1/diag —
    the reference factorizes dense diagonal matrices instead
    (nested_dissection.c:40-77), which the TPU design sidesteps entirely.
    """
    N, n, m = prob.nhorizon, prob.nstates, prob.ninputs
    dtype = prob.A.dtype
    qinv = 1.0 / prob.Qdiag  # [N, n]
    rinv = 1.0 / prob.Rdiag  # [N, m]

    Flambda = jnp.zeros((depth, N, n, n), dtype)
    Fstate = jnp.zeros((depth, N, n, n), dtype)
    Finput = jnp.zeros((depth, N, m, n), dtype)

    # --- negated RHS (ref solver.c:187-190): z = -[x0; q0; r0; d0; q1; ...]
    zy = jnp.concatenate([-prob.x0[None], -prob.f[:-1]], axis=0)  # [N, n]
    zx = -prob.q  # [N, n]
    zu = -prob.r  # [N, m]  (last row unused)

    # --- knots 1..N-1 common terms (ref nested_dissection.c:60-103)
    # zx_k <- Q_k^{-1} zx_k for k >= 1; zu_k <- R_k^{-1} zu_k for 1 <= k < N-1.
    zx = zx.at[1:].mul(qinv[1:])
    zu = zu.at[1:-1].mul(rinv[1:-1])

    # F[level(k), k] <- {Q_k^{-1} A_k', R_k^{-1} B_k'} for 1 <= k < N-1
    # (ref nested_dissection.c:81-86). Scatter along the level axis with the
    # static level table; knots 0 and N-1 are handled separately below.
    ks = np.arange(1, N - 1)
    lvl = levels[ks]  # level(k) for the own-dynamics block
    Fstate = Fstate.at[lvl, ks].set(
        jnp.swapaxes(prob.A[1:-1], -1, -2) * qinv[1:-1, :, None]
    )
    Finput = Finput.at[lvl, ks].set(
        jnp.swapaxes(prob.B[1:-1], -1, -2) * rinv[1:-1, :, None]
    )

    # F[level(k-1), k] <- {Q_k^{-1} (-I), 0} for k >= 1
    # (ref nested_dissection.c:92-102: the -I block from the previous step's
    # dynamics, solved against Q_k).
    ks_all = np.arange(1, N)
    prev_lvl = levels[ks_all - 1]
    neg_qinv_diag = -jnp.eye(n, dtype=dtype)[None] * qinv[1:, :, None]
    Fstate = Fstate.at[prev_lvl, ks_all].set(neg_qinv_diag)

    # --- knot 0 (ref nested_dissection.c:24-58)
    # Fy = -Cy = -A_0', Fx = 0, Fu = R_0^{-1} B_0'
    Flambda = Flambda.at[0, 0].set(-jnp.swapaxes(prob.A[0], -1, -2))
    Finput = Finput.at[0, 0].set(jnp.swapaxes(prob.B[0], -1, -2) * rinv[0, :, None])
    # RHS: zy0_new = -Q_0 zy0 - zx0; zx0_new = -zy0; zu0 = R_0^{-1} zu0
    zy0 = zy[0]
    zy = zy.at[0].set(-prob.Qdiag[0] * zy0 - zx[0])
    zx = zx.at[0].set(-zy0)
    zu = zu.at[0].mul(rinv[0])

    return Flambda, Fstate, Finput, zy, zx, zu


def _sweep_level(
    prob: LQRProblem, t: TreeTables, level: int, fact: RsLqrFactorization
) -> RsLqrFactorization:
    """One level of the factorization sweep (body of the loop in solve.c:68-134).

    Exposed separately so tests can compare per-level state against the golden
    intermediate factors in sample_problem.json (SURVEY.md §4 takeaway 1).
    """
    depth = t.depth
    Flambda, Fstate, Finput, chol = fact.Flambda, fact.Fstate, fact.Finput, fact.chol
    idx = t.leaf_index[level]  # [numleaves] node indices, static
    A_idx = prob.A[idx]  # [L, n, n]
    B_idx = prob.B[idx]  # [L, n, m]

    # 1. Inner products for all fact levels u >= level at once
    #    (ref solve.c:71-83, nested_dissection.c:114-134).
    F1x = Fstate[level:, idx]  # [U, L, n, n]
    F1u = Finput[level:, idx]  # [U, L, m, n]
    F2x = Fstate[level:, idx + 1]
    S_old = Flambda[level:, idx + 1]
    S = (
        jnp.einsum("lij,uljk->ulik", A_idx, F1x)
        + jnp.einsum("lij,uljk->ulik", B_idx, F1u)
        - F2x
        - S_old
    )
    Flambda = Flambda.at[level:, idx + 1].set(S)

    # 2. Batched Cholesky of the separator Schur complements Sbar
    #    (ref solve.c:87-98).
    Sbar = S[0]  # [L, n, n] == Flambda[level, idx+1]
    Lc = jnp.linalg.cholesky(Sbar)
    chol = chol.at[idx].set(Lc)

    # 3. Sbar \ f for the upper-level lambda blocks (ref solve.c:103-116).
    if level + 1 < depth:
        f = Flambda[level + 1 :, idx + 1]  # [U-1, L, n, n]
        fsol = _cho_solve_bcast(Lc, f)
        Flambda = Flambda.at[level + 1 :, idx + 1].set(fsol)

        # 4. Schur-complement updates for every knot (ref solve.c:119-131).
        sep = t.sep_index[:, level]  # [N] static
        mask = t.calc_lambda[:, level]  # [N] static
        fmat = Flambda[level + 1 :, sep + 1]  # [U-1, N, n, n]
        upd_l = jnp.einsum("kij,ukjl->ukil", Flambda[level], fmat)
        upd_x = jnp.einsum("kij,ukjl->ukil", Fstate[level], fmat)
        upd_u = jnp.einsum("kij,ukjl->ukil", Finput[level], fmat)
        mask_l = jnp.asarray(mask)[None, :, None, None]
        Flambda = Flambda.at[level + 1 :].add(jnp.where(mask_l, -upd_l, 0))
        Fstate = Fstate.at[level + 1 :].add(-upd_x)
        Finput = Finput.at[level + 1 :].add(-upd_u)

    return RsLqrFactorization(Flambda=Flambda, Fstate=Fstate, Finput=Finput, chol=chol)


def factorize(
    prob: LQRProblem, tables: Optional[TreeTables] = None
) -> Tuple[RsLqrFactorization, Tuple[jax.Array, jax.Array, jax.Array]]:
    """Phases 1-2: leaf solves + the level sweep (ref solve.c:50-134).

    Returns the factorization and the leaf-solved RHS ``(zy, zx, zu)``.
    """
    N = prob.nhorizon
    t = tables or build_tree_tables(N)
    n = prob.nstates

    Flambda, Fstate, Finput, zy, zx, zu = _leaf_solve(prob, t.levels, t.depth)
    fact = RsLqrFactorization(
        Flambda=Flambda,
        Fstate=Fstate,
        Finput=Finput,
        chol=jnp.zeros((N - 1, n, n), prob.A.dtype),
    )
    for level in range(t.depth):
        fact = _sweep_level(prob, t, level, fact)
    return fact, (zy, zx, zu)


def _cho_solve_bcast(Lc: jax.Array, rhs: jax.Array) -> jax.Array:
    """cho_solve with ``Lc [L, n, n]`` broadcast over leading axes of rhs."""
    Lb = jnp.broadcast_to(Lc, rhs.shape[:-3] + Lc.shape)
    return jax.scipy.linalg.cho_solve((Lb, True), rhs)


def solve_rhs(
    prob: LQRProblem,
    fact: RsLqrFactorization,
    rhs: Tuple[jax.Array, jax.Array, jax.Array],
    tables: Optional[TreeTables] = None,
) -> RsLqrSolution:
    """Phase 3: solve the (leaf-solved) RHS with the cached factorization.

    Ref solve.c:137-182. Exposing this separately from :func:`factorize`
    enables the multi-RHS mode the reference only hints at (nddata.h:72-75).
    """
    N = prob.nhorizon
    t = tables or build_tree_tables(N)
    zy, zx, zu = rhs

    for level in range(t.depth):
        idx = t.leaf_index[level]
        # Inner product against the RHS (ref solve.c:147, fact_level = 0):
        # zy[idx+1] <- A zx[idx] + B zu[idx] - zx[idx+1] - zy[idx+1]
        znew = (
            jnp.einsum("lij,lj->li", prob.A[idx], zx[idx])
            + jnp.einsum("lij,lj->li", prob.B[idx], zu[idx])
            - zx[idx + 1]
            - zy[idx + 1]
        )
        # Separator solve with cached Cholesky (ref solve.c:153-170).
        Lc = fact.chol[idx]
        zbar = jax.scipy.linalg.cho_solve((Lc, True), znew[..., None])[..., 0]
        zy = zy.at[idx + 1].set(zbar)

        # Propagate into the solution vector (ref solve.c:176-180):
        # g_k -= F[level, k] @ zbar[sep_k + 1]
        sep = t.sep_index[:, level]
        mask = jnp.asarray(t.calc_lambda[:, level])[:, None]
        fvec = zy[sep + 1]  # [N, n]
        zy = zy - jnp.where(mask, jnp.einsum("kij,kj->ki", fact.Flambda[level], fvec), 0)
        zx = zx - jnp.einsum("kij,kj->ki", fact.Fstate[level], fvec)
        zu = zu - jnp.einsum("kij,kj->ki", fact.Finput[level], fvec)

    return RsLqrSolution(Y=zy, X=zx, U=zu[:-1], fact=fact)


def solve(prob: LQRProblem, tables: Optional[TreeTables] = None) -> RsLqrSolution:
    """Full rsLQR solve (ref ndlqr_Solve, solve.c:38-190).

    Pure and jittable; ``jax.vmap(solve)`` batches thousands of instances.
    """
    t = tables or build_tree_tables(prob.nhorizon)
    fact, rhs = factorize(prob, t)
    return solve_rhs(prob, fact, rhs, t)


def solve_kkt(prob: LQRProblem) -> jax.Array:
    """Convenience: solve and return the flat KKT vector."""
    return solve(prob).kkt_vector()

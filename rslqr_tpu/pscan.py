"""Parallel Riccati LQR solver via associative scans — O(log N) depth.

A third solver family beyond the reference's two (rsLQR tree solve +
serial Riccati): the backward Riccati recursion is re-expressed as an
associative suffix scan over "conditional value function" elements, and the
closed-loop forward rollout as an associative prefix scan over affine maps
(temporal-parallelization approach of Särkkä & García-Fernández, IEEE TAC
2021). This is the natively TPU-shaped answer to the problem the reference's
nested-dissection tree solves with OpenMP level sweeps (docs/rslqr.dox:65-138):
``lax.associative_scan`` gives the same log-depth parallelism with only
``[N]``-element state (no ``[depth, N]`` factor grids), so far less HBM
traffic per solve.

Derivation sketch. Represent the optimal cost between fixed endpoints as

  V_{k->l}(x_k, x_l) = sup_lam [ lam' x_l - lam' F x_k - lam' c
                                 - 1/2 lam' C lam ] + 1/2 x_k' J x_k - eta' x_k

(deterministic control: ``C = controllability-weighted reachability``,
``F, c`` the free dynamics, ``J, eta`` the accumulated quadratic cost).
One step with cost 1/2 x'Qx + q'x + 1/2 u'Ru + r'u and dynamics
x+ = A x + B u + f minimizes over u to give the leaf element

  F = A,  c = f - B R^{-1} r,  C = B R^{-1} B',  J = Q,  eta = -q,

and minimizing over the shared midpoint x_m gives the associative combine

  M1 = (I + C1 J2)^{-1},  M2 = (I + J2 C1)^{-1}
  F = F2 M1 F1
  c = F2 M1 (c1 + C1 eta2') + c2          with eta2' = -eta2... see code
  C = F2 M1 C1 F2' + C2
  eta = F1' M2 (eta2 - J2 c1) + eta1
  J = F1' M2 J2 F1 + J1

The terminal cost enters as the element (F=0, c=0, C=0, J=Q_N, eta=-q_N);
a reverse (suffix) scan then yields every cost-to-go (P_k, p_k) =
(J_k, -eta_k) simultaneously, gains follow vectorized over all knots, and a
prefix scan over (Phi_k, d_k) = (A + B K, B d + f) recovers the trajectory.

All element algebra runs in the same batch-last layout as
:mod:`rslqr_tpu.rslqr` (instances on the TPU lane axis, tiny block dims
unrolled — see :mod:`rslqr_tpu.linalg`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import linalg as la
from .problem import LQRProblem, pack_solution
from .riccati import RiccatiSolution


def _combine(e1, e2, nb: int):
    """Associative combine of conditional-value-function elements.

    ``e = (F, c, C, eta, J)`` with shapes ``[..., n, n, *b]`` / ``[..., n, *b]``.

    Only ONE factorization is needed per combine: with ``M1 = (I + C1 J2)^-1``
    and ``M2 = (I + J2 C1)^-1``, symmetry of C1 and J2 gives
    ``M2 J2 = J2 M1`` and the Woodbury-style identity ``M2 = I - J2 M1 C1``,
    so every M2 application routes through M1:

      J   = F1' M2 J2 F1 + J1       = F1' J2 (M1 F1) + J1
      eta = F1' M2 w + eta1,  w = eta2 - J2 c1
                                    = F1' (w - J2 M1 (C1 w)) + eta1

    The small-block path factors ``I + C1 J2`` once with an unpivoted LU
    (eigenvalues >= 1 since C1 J2 is a PSD product — well-conditioned) and
    solves a single stacked right-hand side of width 2n+2.
    """
    F1, c1, C1, eta1, J1 = e1
    F2, c2, C2, eta2, J2 = e2
    n = F1.shape[-(nb + 2)]

    IC = la.bgemm_tt(C1, J2, nb, dconst=1.0)
    w = eta2 - la.bgemv(J2, c1, nb)
    ve = lambda v: jnp.expand_dims(v, -(nb + 1))
    b_c = ve(c1 + la.bgemv(C1, eta2, nb))
    b_w = ve(la.bgemv(C1, w, nb))
    F1t = la.transpose_block(F1, nb)  # before the solve: F1 may be donated
    if n <= la.small_block_threshold():
        rhs = jnp.concatenate([F1, b_c, C1, b_w], axis=-(nb + 1))
        LU, dinv = la.blu_factor(IC, nb)
        sol = la.blu_solve(LU, dinv, rhs, nb)
        MF1 = sol[(Ellipsis, slice(0, n)) + (slice(None),) * nb]
        Mc = sol[(Ellipsis, n) + (slice(None),) * nb]
        MC1 = sol[(Ellipsis, slice(n + 1, 2 * n + 1)) + (slice(None),) * nb]
        MCw = sol[(Ellipsis, 2 * n + 1) + (slice(None),) * nb]
    else:
        # Mid-block: one fused multi-RHS LU kernel, no stacked-RHS copies.
        MF1, Mcm, MC1, MCwm = la.bsolve_multi(IC, (F1, b_c, C1, b_w), nb)
        Mc = Mcm.squeeze(-(nb + 1))
        MCw = MCwm.squeeze(-(nb + 1))

    F = la.bgemm(F2, MF1, nb)
    c = la.bgemv(F2, Mc, nb) + c2
    # C / J are symmetric (C1 M1' = M1 C1, J2 M1 likewise): sym halves the
    # FMAs, tbt reads F2 transposed in-kernel (no relayout pass), and cin
    # fuses the += into the same HBM pass.
    C = la.bgemm_tt(
        la.bgemm(F2, MC1, nb), F2, nb, tbt=True, cin=C2, sub=False, sym=True
    )
    J = la.bgemm_tt(
        F1t, la.bgemm(J2, MF1, nb), nb, cin=J1, sub=False, sym=True
    )
    eta = la.bgemv(F1t, w - la.bgemv(J2, MCw, nb), nb) + eta1
    return (F, c, C, eta, J)


def _combine_reduced(e1, pj2, nb: int):
    """Reduced combine: full left element x (eta2, J2) of the right segment
    -> (eta, J) of the combination only.

    Every *final* output of the suffix scan is consumed solely as a
    cost-to-go pair ``(P, p) = (J, -eta)`` — and, inside the recursion, as
    the right argument of another reduced combine (which again reads only
    ``eta2``/``J2``). So the scan's down-sweep never needs ``F``/``c``/``C``
    of its results: this variant drops those 3 of 5 gemms and halves the LU
    right-hand-side width (n+1 instead of 2n+2) relative to :func:`_combine`.
    """
    F1, c1, C1, eta1, J1 = e1
    eta2, J2 = pj2
    n = F1.shape[-(nb + 2)]

    IC = la.bgemm_tt(C1, J2, nb, dconst=1.0)
    w = eta2 - la.bgemv(J2, c1, nb)
    b_w = jnp.expand_dims(la.bgemv(C1, w, nb), -(nb + 1))
    F1t = la.transpose_block(F1, nb)  # before the solve: F1 may be donated
    if n <= la.small_block_threshold():
        rhs = jnp.concatenate([F1, b_w], axis=-(nb + 1))
        LU, dinv = la.blu_factor(IC, nb)
        sol = la.blu_solve(LU, dinv, rhs, nb)
        MF1 = sol[(Ellipsis, slice(0, n)) + (slice(None),) * nb]
        MCw = sol[(Ellipsis, n) + (slice(None),) * nb]
    else:
        MF1, MCwm = la.bsolve_multi(IC, (F1, b_w), nb)
        MCw = MCwm.squeeze(-(nb + 1))

    J = la.bgemm_tt(
        F1t, la.bgemm(J2, MF1, nb), nb, cin=J1, sub=False, sym=True
    )
    eta = la.bgemv(F1t, w - la.bgemv(J2, MCw, nb), nb) + eta1
    return eta, J


def _sc(x: jax.Array, sl, em: bool = False) -> jax.Array:
    """Slice the scan axis: leading (default) or -2 (element-major mode,
    where arrays are ``[p(, q), L, B]`` with the scan length second-minor)."""
    if not em:
        return x[sl]
    return x[(Ellipsis, sl, slice(None))]


def _cat(xs, em: bool = False) -> jax.Array:
    return jnp.concatenate(xs, axis=-2 if em else 0)


def _slen(x: jax.Array, em: bool = False) -> int:
    return x.shape[-2] if em else x.shape[0]


def _tree_slice(elems, sl, em: bool = False):
    return tuple(_sc(x, sl, em) for x in elems)


def _even_odd(x: jax.Array, em: bool = False):
    """Split even/odd positions of an even-length scan axis.

    Two lowerings, chosen by block size (measured on v5e): for small blocks
    the stride-2 slice fuses into consumers and is ~2x faster end-to-end;
    for large blocks (quadruped nx=36) XLA lowers the strided slice as a
    gather whose VMEM scratch blows the 16MB budget, so reshape + unit
    slices (free) are used instead. Element-major mode always reshapes
    (its scan axis is second-minor; unit slices are free).
    """
    if em:
        # Strided slice on the second-minor scan axis: reads whole lane
        # rows. (A reshape to [.., L/2, 2, B] would retile the minor dims
        # as (2, B) — 4x sublane padding on any materialization.)
        return x[..., 0::2, :], x[..., 1::2, :]
    if x.shape[1] <= la.small_block_threshold():
        return x[0::2], x[1::2]
    y = x.reshape((x.shape[0] // 2, 2) + x.shape[1:])
    return y[:, 0], y[:, 1]


def _tree_even_odd(elems, em: bool = False):
    pairs = [_even_odd(x, em) for x in elems]
    return tuple(p[0] for p in pairs), tuple(p[1] for p in pairs)


def _interleave(a: jax.Array, b: jax.Array, em: bool = False) -> jax.Array:
    """[L, ...], [L, ...] -> [2L, ...] as a0 b0 a1 b1 ... on the scan axis."""
    if em:
        # Strided scatter on the scan axis (same layout rationale as
        # _even_odd: avoid the (2, B) minor-dim retile).
        L = a.shape[-2]
        out = jnp.zeros(a.shape[:-2] + (2 * L, a.shape[-1]), a.dtype)
        out = out.at[..., 0::2, :].set(a)
        return out.at[..., 1::2, :].set(b)
    return jnp.stack([a, b], axis=1).reshape((-1,) + a.shape[1:])


def _suffix_pj(
    elems, nb: int, seed=None, em: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """All-suffix reductions of value elements, returning only ``(eta, J)``.

    Hand-rolled odd-even (Brent–Kung) suffix scan replacing
    ``lax.associative_scan(reverse=True)``: the up-sweep (pairwise full
    combines, N-1 total) is identical, but the down-sweep (~N combines)
    uses :func:`_combine_reduced` because every down-sweep result is final —
    ~25% fewer flops and ~2.5x less write traffic on that half of the scan.

    ``seed``: optional ``(eta [1, n, *b], J [1, n, n, *b])`` cost-to-go pair
    appended after the last element, i.e. S_k = reduce(e_k..e_{L-1}, seed).
    Used by the horizon-sharded solver (rslqr_tpu.parallel.pscan_seq), where
    the seed is the combined suffix of all chunks to the right.
    """
    L = _slen(elems[0], em)
    if L == 1:
        if seed is None:
            return elems[3], elems[4]
        return _combine_reduced(elems, seed, nb)
    if L % 2 == 1:
        # Peel the first element: S_0 = combine(e_0, S_1).
        eta_r, J_r = _suffix_pj(
            _tree_slice(elems, slice(1, None), em), nb, seed, em
        )
        e0 = _tree_slice(elems, slice(0, 1), em)
        eta0, J0 = _combine_reduced(
            e0, (_sc(eta_r, slice(0, 1), em), _sc(J_r, slice(0, 1), em)), nb
        )
        return _cat([eta0, eta_r], em), _cat([J0, J_r], em)
    e_even, e_odd = _tree_even_odd(elems, em)
    c = _combine(e_even, e_odd, nb)  # segment [2i, 2i+1], full elements
    eta_p, J_p = _suffix_pj(c, nb, seed, em)  # S_{2i} over pairs (even outs)
    # S_{2i+1} = combine(e_{2i+1}, S_{2i+2}) for i < L/2-1;
    # S_{L-1} = e_{L-1} (+ seed).
    e_last = _tree_slice(e_odd, slice(-1, None), em)
    if seed is None:
        eta_last, J_last = e_last[3], e_last[4]
    else:
        eta_last, J_last = _combine_reduced(e_last, seed, nb)
    if L > 2:
        eta_o, J_o = _combine_reduced(
            _tree_slice(e_odd, slice(0, -1), em),
            (_sc(eta_p, slice(1, None), em), _sc(J_p, slice(1, None), em)),
            nb,
        )
        eta_odd = _cat([eta_o, eta_last], em)
        J_odd = _cat([J_o, J_last], em)
    else:
        eta_odd, J_odd = eta_last, J_last
    return _interleave(eta_p, eta_odd, em), _interleave(J_p, J_odd, em)


def _reduce_full(elems, nb: int, em: bool = False):
    """Reduce a whole element sequence to ONE full element (pairwise tree;
    identical pair combines to the up-sweep of :func:`_suffix_pj`, so XLA
    CSE dedupes them when both run in one program)."""
    L = _slen(elems[0], em)
    while L > 1:
        if L % 2 == 1:
            head = _tree_slice(elems, slice(0, 1), em)
            rest = _tree_slice(elems, slice(1, None), em)
            rest_even, rest_odd = _tree_even_odd(rest, em)
            c = _combine(rest_even, rest_odd, nb)
            e0c = _combine(head, _tree_slice(c, slice(0, 1), em), nb)
            elems = tuple(
                _cat([a, _sc(b, slice(1, None), em)], em)
                for a, b in zip(e0c, c)
            )
        else:
            e_even, e_odd = _tree_even_odd(elems, em)
            elems = _combine(e_even, e_odd, nb)
        L = _slen(elems[0], em)
    return elems


def _value_scan(prob_bl: LQRProblem, nb: int) -> Tuple[jax.Array, jax.Array]:
    """Suffix-scan all cost-to-go pairs ``(P_k [N,n,n,*b], p_k [N,n,*b])``."""
    A, B = prob_bl.A, prob_bl.B
    N, n = A.shape[0], A.shape[1]
    b_shape = A.shape[3:]
    dtype = A.dtype

    rinv = 1.0 / prob_bl.Rdiag  # [N, m, *b]
    Brinv = B * jnp.expand_dims(rinv, -(nb + 2))  # B R^{-1}: scale columns
    Bt = la.transpose_block(B, nb)

    # Leaf elements for steps 0..N-2.
    F = A[:-1]
    c = prob_bl.f[:-1] - la.bgemv(Brinv[:-1], prob_bl.r[:-1], nb)
    C = la.bgemm(Brinv[:-1], Bt[:-1], nb)
    eta = -prob_bl.q[:-1]
    Jq = jnp.zeros((N - 1, n, n) + b_shape, dtype)
    diag = (jnp.arange(n), jnp.arange(n))
    Jq = Jq.at[(slice(None),) + diag].set(prob_bl.Qdiag[:-1])

    # Terminal element: pure cost, no propagation.
    zF = jnp.zeros((1, n, n) + b_shape, dtype)
    JN = jnp.zeros((1, n, n) + b_shape, dtype).at[(slice(None),) + diag].set(
        prob_bl.Qdiag[-1:]
    )
    elems = (
        jnp.concatenate([F, zF], axis=0),
        jnp.concatenate([c, jnp.zeros((1, n) + b_shape, dtype)], axis=0),
        jnp.concatenate([C, zF], axis=0),
        jnp.concatenate([eta, -prob_bl.q[-1:]], axis=0),
        jnp.concatenate([Jq, JN], axis=0),
    )

    eta_all, J_all = _suffix_pj(elems, nb)
    P = J_all  # [N, n, n, *b]
    p = -eta_all  # [N, n, *b]
    return P, p


def _gains(prob_bl: LQRProblem, P, p, nb: int):
    """Vectorized gain computation from next-step cost-to-go (all k at once).

    Same per-step algebra as the serial backward pass (riccati_solve.c:50-93)
    but batched over the whole horizon since every P_{k+1} is already known.
    """
    return _gains_from(
        prob_bl.A[:-1], prob_bl.B[:-1], prob_bl.Rdiag[:-1], prob_bl.r[:-1],
        prob_bl.f[:-1], P[1:], p[1:], nb,
    )


def _gains_from(A, B, Rd, r, f, Pn, pn, nb: int, em: bool = False):
    """Gain algebra on explicit per-knot arrays (shared with the
    horizon-sharded path, where ``Pn``/``pn`` cross a device boundary).
    ``em``: block dims lead (``[m, m, L, B]``) instead of following the
    knot axis (kept for call-site documentation; the fused diag add in
    :func:`linalg.bgemm_tt` indexes batch-relative, covering both)."""
    Bt = la.transpose_block(B, nb)
    BtP = la.bgemm(Bt, Pn, nb)
    Quu = la.bgemm_tt(BtP, B, nb, diag=Rd, sym=True)
    Qux = la.bgemm(BtP, A, nb)
    Qu = r + la.bgemv(Bt, la.bgemv(Pn, f, nb) + pn, nb)

    Lc = la.bcholesky(Quu, nb)
    K = -la.bcho_solve(Lc, Qux, nb)
    d = -la.bcho_solve_vec(Lc, Qu, nb)
    return K, d


def _prefix_action(Phi, tvec, x0, nb: int) -> jax.Array:
    """All-prefix actions ``a_k = (Phi_k ∘ ... ∘ Phi_0)(x0)``, i.e. x_{k+1}.

    Odd-even prefix scan over affine maps where the down-sweep propagates
    only the map's *action* on the fixed x0 — a gemv instead of the gemm a
    generic ``associative_scan`` over (Phi, t) pairs would do. Up-sweep
    (pairwise map composition) is unchanged.
    """
    L = Phi.shape[0]
    if L == 1:
        return (la.bgemv(Phi[0], x0, nb) + tvec[0])[None]
    if L % 2 == 1:
        head = _prefix_action(Phi[:-1], tvec[:-1], x0, nb)
        last = la.bgemv(Phi[-1], head[-1], nb) + tvec[-1]
        return jnp.concatenate([head, last[None]], axis=0)
    Phi_e, Phi_o = _even_odd(Phi)
    t_e, t_o = _even_odd(tvec)
    # Composition over segment [2i, 2i+1].
    Phi_c = la.bgemm(Phi_o, Phi_e, nb)
    t_c = la.bgemv(Phi_o, t_e, nb) + t_o
    a_pair = _prefix_action(Phi_c, t_c, x0, nb)  # a_{2i+1}
    # a_0 = Phi_0 x0 + t_0; a_{2i} = Phi_{2i} a_{2i-1} + t_{2i} (gemv only).
    a0 = la.bgemv(Phi_e[0], x0, nb) + t_e[0]
    if L > 2:
        a_even_rest = la.bgemv(Phi_e[1:], a_pair[:-1], nb) + t_e[1:]
        a_even = jnp.concatenate([a0[None], a_even_rest], axis=0)
    else:
        a_even = a0[None]
    return _interleave(a_even, a_pair)


def _forward_scan(prob_bl: LQRProblem, K, d, nb: int):
    """Prefix-scan the closed-loop rollout x_{k+1} = Phi_k x_k + t_k."""
    A, B = prob_bl.A[:-1], prob_bl.B[:-1]
    Phi = A + la.bgemm(B, K, nb)
    tvec = la.bgemv(B, d, nb) + prob_bl.f[:-1]
    xs = _prefix_action(Phi, tvec, prob_bl.x0, nb)  # [N-1, n, *b]
    X = jnp.concatenate([prob_bl.x0[None], xs], axis=0)  # [N, n, *b]
    return X


def _combine_leaf_pair(l1, l2, nb: int):
    """Full combine specialized to LEAF operands: ``C1 = Brinv1 @ B1'``
    has rank m and ``J2 = diag(Qd2)``, so the n-by-n ``(I + C1 J2)`` solve
    collapses to an m-by-m Woodbury solve:

      M1 = (I + U V J2)^{-1} = I - U Sm^{-1} V J2,  Sm = I_m + (V J2) U
      M1 U = U Sm^{-1}  (so every M1-application is a chain through M1U)

    with ``U = Brinv1``, ``V = B1'``. At the quadruped scale (n=36, m=12)
    this roughly halves the first (largest) up-sweep level's FLOPs and
    never materializes the leaf ``C``/``J`` slabs. ``l1``/``l2`` are
    ``(A, Brinv, Bt, c, eta, Qd)`` element-major leaf tuples; the right
    element may be the terminal pure-cost element via zeroed A/B rows.
    """
    A1, U1, V1, c1, eta1, Qd1 = l1
    A2, U2, V2, c2, eta2, Qd2 = l2
    n, m = A1.shape[0], U1.shape[1]
    dg_m = (jnp.arange(m), jnp.arange(m))

    T = V1 * Qd2[None]  # B1' J2: column j scaled by Qd2[j]
    Sm = la.bgemm_tt(T, U1, nb, dconst=1.0)
    eyeP = jnp.zeros(Sm.shape, Sm.dtype).at[dg_m].set(1.0)
    (G_I,) = la.bsolve_multi(Sm, (eyeP,), nb)
    M1U = la.bgemm_tt(U1, G_I, nb)  # U Sm^{-1} [n, m]
    TA1 = la.bgemm_tt(T, A1, nb)    # [m, n]
    MF1 = A1 - la.bgemm_tt(M1U, TA1, nb)

    F = la.bgemm_tt(A2, MF1, nb)
    # C = F2 (M1 C1) F2' + C2 = (F2 M1U) (V1 F2') + C2.
    W = la.bgemm_tt(A2, M1U, nb)            # [n, m]
    Vt = la.bgemm_tt(V1, A2, nb, tbt=True)  # B1' A2' [m, n]
    C2 = la.bgemm_tt(U2, V2, nb)            # Brinv2 B2'
    C = la.bgemm_tt(W, Vt, nb, cin=C2, sub=False, sym=True)
    # J = F1' diag(Qd2) (M1 F1) + diag(Qd1): the diagonal middle factor and
    # the diagonal add both fuse into the kernel (kscale/diag flags).
    J = la.bgemm_tt(
        A1, MF1, nb, ta=True, kscale=Qd2, diag=Qd1, sym=True
    )

    b_c = c1 + la.bgemv(U1, la.bgemv(V1, eta2, nb), nb)
    c = la.bgemv(A2, b_c - la.bgemv(M1U, la.bgemv(T, b_c, nb), nb), nb) + c2
    w = eta2 - Qd2 * c1
    MCw = la.bgemv(M1U, la.bgemv(V1, w, nb), nb)  # M1 C1 w = M1U (V1 w)
    A1t = la.transpose_block(A1, nb)
    eta = la.bgemv(A1t, w - Qd2 * MCw, nb) + eta1
    return (F, c, C, eta, J)


def _combine_reduced_leaf(l1, pj2, nb: int, gains=None):
    """Reduced combine with a LEAF left element: the rank-m Woodbury form
    of :func:`_combine_reduced` (same identity as :func:`_combine_leaf_pair`
    but with a full right cost-to-go ``J2``). This is the whole finest
    level of the suffix scan's down-sweep — mathematically one backward
    Riccati step per odd knot (riccati_solve.c:38-112).

    ``gains``: optional ``(rinv1 [m, *b], r1 [m, *b])``; when given, ALSO
    returns the Riccati gains ``(K, d)`` of this step, almost for free:
    the Woodbury intermediates ARE the gain algebra —

      Sm  = I + B' P B R^{-1} = Quu R^{-1}   (so Quu^{-1} = R^{-1} Sm^{-1})
      TA1 = B' P A            = Qux
      Qu  = r + B'(P f + p)   = Sm r - B' w  (w = -p - P c1, c1 = f - BR^{-1}r)

    giving ``K = -R^{-1} (Sm^{-1} Qux)`` and
    ``d = R^{-1} (Sm^{-1} (B' w) - r)`` with no extra factorization, no
    Quu/Qux gemms, and no sliced read of the assembled P slab
    (riccati_solve.c:80-93 collapsed into the down-sweep)."""
    A1, U1, V1, c1, eta1, Qd1 = l1
    eta2, J2 = pj2
    m = U1.shape[1]
    n = A1.shape[0]
    dg_m = (jnp.arange(m), jnp.arange(m))

    T = la.bgemm_tt(V1, J2, nb)  # B1' J2 [m, n]
    Sm = la.bgemm_tt(T, U1, nb, dconst=1.0)
    eyeP = jnp.zeros(Sm.shape, Sm.dtype).at[dg_m].set(1.0)
    (G_I,) = la.bsolve_multi(Sm, (eyeP,), nb)
    M1U = la.bgemm_tt(U1, G_I, nb)
    TA1 = la.bgemm_tt(T, A1, nb)
    MF1 = A1 - la.bgemm_tt(M1U, TA1, nb)

    J2MF1 = la.bgemm_tt(J2, MF1, nb)
    J = la.bgemm_tt(A1, J2MF1, nb, ta=True, diag=Qd1, sym=True)
    w = eta2 - la.bgemv(J2, c1, nb)
    Vw = la.bgemv(V1, w, nb)  # B1' w [m]
    MCw = la.bgemv(M1U, Vw, nb)
    eta = (
        la.bgemv(la.transpose_block(A1, nb), w - la.bgemv(J2, MCw, nb), nb)
        + eta1
    )
    if gains is None:
        return eta, J
    rinv1, r1 = gains
    ve = jnp.expand_dims(rinv1, -(nb + 1))  # [m, 1, *b] row scale
    K = -ve * la.bgemm_tt(G_I, TA1, nb)
    d = rinv1 * (la.bgemv(G_I, Vw, nb) - r1)
    return eta, J, K, d


def _combine_leaf_full(l1, e2, nb: int):
    """Full combine with a LEAF left element and a generic right element:
    the rank-m Woodbury route of :func:`_combine` (``C1 = U1 V1`` has rank
    m, so the n-by-n ``(I + C1 J2)`` solve collapses to an m-by-m solve and
    ``M1 C1 = U1 Sm^{-1} V1`` never materializes ``C1``). This is the serial
    chunk-composite fold step of the chunked hybrid scan: ~3 n^3 gemms +
    O(n^2 m) against the generic combine's ~8 n^3."""
    A1, U1, V1, c1, eta1, Qd1 = l1
    F2, c2, C2, eta2, J2 = e2
    n, m = A1.shape[0], U1.shape[1]
    dg_m = (jnp.arange(m), jnp.arange(m))

    T = la.bgemm_tt(V1, J2, nb)  # B1' J2 [m, n]
    Sm = la.bgemm_tt(T, U1, nb, dconst=1.0)
    eyeP = jnp.zeros(Sm.shape, Sm.dtype).at[dg_m].set(1.0)
    (G_I,) = la.bsolve_multi(Sm, (eyeP,), nb)
    M1U = la.bgemm_tt(U1, G_I, nb)  # U Sm^{-1} [n, m]
    TA1 = la.bgemm_tt(T, A1, nb)  # [m, n]
    MF1 = A1 - la.bgemm_tt(M1U, TA1, nb)  # M1 A1

    F = la.bgemm_tt(F2, MF1, nb)
    # C = F2 (M1 C1) F2' + C2 with M1 C1 = M1U V1 (rank m).
    W = la.bgemm_tt(F2, M1U, nb)  # [n, m]
    Vt = la.bgemm_tt(V1, F2, nb, tbt=True)  # V1 F2' [m, n]
    C = la.bgemm_tt(W, Vt, nb, cin=C2, sub=False, sym=True)
    # J = F1' (J2 M1 F1) + J1, J1 = diag(Qd1) (diag fused).
    J2MF1 = la.bgemm_tt(J2, MF1, nb)
    J = la.bgemm_tt(A1, J2MF1, nb, ta=True, diag=Qd1, sym=True)

    b_c = c1 + la.bgemv(U1, la.bgemv(V1, eta2, nb), nb)
    c = (
        la.bgemv(F2, b_c - la.bgemv(M1U, la.bgemv(T, b_c, nb), nb), nb) + c2
    )
    w = eta2 - la.bgemv(J2, c1, nb)
    MCw = la.bgemv(M1U, la.bgemv(V1, w, nb), nb)  # M1 C1 w
    eta = (
        la.bgemv(la.transpose_block(A1, nb), w - la.bgemv(J2, MCw, nb), nb)
        + eta1
    )
    return (F, c, C, eta, J)


def _suffix_pj_leaf_em(leaf, nb2: int):
    """First suffix-scan level on structured leaves (element-major): pair
    combines via :func:`_combine_leaf_pair`, generic :func:`_suffix_pj` over
    the composites, finest down-sweep via :func:`_combine_reduced_leaf`."""
    A, U, V, c, eta, Qd = leaf
    n = A.shape[0]
    sp = lambda x: _even_odd(x, em=True)
    A1, A2 = sp(A)
    U1, U2 = sp(U)
    V1, V2 = sp(V)
    c1, c2 = sp(c)
    eta1, eta2 = sp(eta)
    Qd1, Qd2 = sp(Qd)
    comp = _combine_leaf_pair(
        (A1, U1, V1, c1, eta1, Qd1), (A2, U2, V2, c2, eta2, Qd2), nb2
    )
    eta_p, J_p = _suffix_pj(comp, nb2, em=True)
    L2 = A1.shape[-2]
    last = lambda x: x[(Ellipsis, slice(L2 - 1, L2), slice(None))]
    head = lambda x: x[(Ellipsis, slice(0, L2 - 1), slice(None))]
    tail = lambda x: x[(Ellipsis, slice(1, None), slice(None))]
    eta_last = last(eta2)  # terminal element: eta = -q_N
    J_last = jnp.zeros((n, n) + eta_last.shape[1:], A.dtype).at[
        (jnp.arange(n), jnp.arange(n))
    ].set(last(Qd2))
    if L2 > 1:
        eta_o, J_o = _combine_reduced_leaf(
            (head(A2), head(U2), head(V2), head(c2), head(eta2), head(Qd2)),
            (tail(eta_p), tail(J_p)),
            nb2,
        )
        eta_odd = _cat([eta_o, eta_last], em=True)
        J_odd = _cat([J_o, J_last], em=True)
    else:
        eta_odd, J_odd = eta_last, J_last
    return _interleave(eta_p, eta_odd, em=True), _interleave(J_p, J_odd, em=True)


def _leaf_em(pem, nb2: int):
    """Element-major structured leaf arrays ``(A, Brinv, Bt, c, eta, Qd)``
    over all N slots; the terminal slot's zeroed dynamics make it the
    pure-cost element (F = c = C = 0, J = diag(Q_N)). Requires N even."""
    A, B = pem["A"], pem["B"]
    n, m = A.shape[0], B.shape[1]
    N, Bb = A.shape[2], A.shape[3]
    dtype = A.dtype

    rinv = 1.0 / pem["Rdiag"]  # [m, N, B]
    Brinv = B * rinv[None]
    Bt = jnp.swapaxes(B, 0, 1)
    S = lambda x, sl: x[(Ellipsis, sl, slice(None))]
    c_dyn = S(pem["f"], slice(0, N - 1)) - la.bgemv(
        S(Brinv, slice(0, N - 1)), S(pem["r"], slice(0, N - 1)), nb2
    )
    zc = jnp.zeros((n, n, 1, Bb), dtype)
    zcm = jnp.zeros((n, m, 1, Bb), dtype)
    return (
        _cat([S(A, slice(0, N - 1)), zc], em=True),
        _cat([S(Brinv, slice(0, N - 1)), zcm], em=True),
        _cat([S(Bt, slice(0, N - 1)), jnp.swapaxes(zcm, 0, 1)], em=True),
        _cat([c_dyn, jnp.zeros((n, 1, Bb), dtype)], em=True),
        -pem["q"],
        pem["Qdiag"],
    )


def _value_scan_chunked_em(
    pem, nb2: int, s: int, gains: bool = False, batched: bool = False
):
    """Chunked hybrid suffix scan (element-major): serial Woodbury leaf
    folds build one full composite per ``s``-knot chunk, the generic
    odd-even tree reduces only the N/s composites, and the interior
    cost-to-gos come from ``s - 1`` serial within-chunk Woodbury-Riccati
    steps (:func:`_combine_reduced_leaf`) seeded by the next chunk's
    boundary suffix.

    The win over :func:`_suffix_pj_leaf_em` is mostly GLUE, not FLOPs: the
    leaves are relayouted ONCE to ``[s, p, q, C, B]`` (fused by XLA into
    the element-major transpose that builds them), after which every
    serial step slices a contiguous ``[p, q, C, B]`` slab — no strided
    even/odd splits or interleave scatters feeding the Pallas kernels,
    and the log-depth part of the scan touches arrays ``s`` times smaller.
    """
    leaf = _leaf_em(pem, nb2)
    N = leaf[0].shape[-2]
    C = N // s

    def chunkify(x):
        # [.., N, B] -> [s, .., C, B]: one relayout, fused upstream.
        y = x.reshape(x.shape[:-2] + (C, s, x.shape[-1]))
        return jnp.moveaxis(y, -2, 0)

    lc = tuple(chunkify(x) for x in leaf)
    lj = lambda j: tuple(x[j] for x in lc)

    emit = gains and batched
    comp0 = _combine_leaf_pair(lj(s - 2), lj(s - 1), nb2)
    comp = comp0
    comps = None
    if s > 2:
        # Serial fold as lax.scan: ONE compiled combine body instead of
        # s - 2 unrolled copies (the unrolled form dominated the quadruped
        # program's compile latency, BENCH_r04 compile_first_s ~108 s).
        # Each scan step slices a contiguous [p, q, C, B] slab off the
        # stacked leaf arrays — same access pattern as the unrolled loop.
        rest = tuple(x[: s - 2] for x in lc)

        if emit:
            # Emit every carry: ys[j] is the composite of in-chunk
            # positions j..s-1, i.e. exactly the within-chunk suffix
            # element the down-sweep needs at position j (reverse scan
            # stacks ys at the xs input index).
            def fold_body(c, leaf_j):
                nxt = _combine_leaf_full(leaf_j, c, nb2)
                return nxt, nxt

            comp, comps_r = jax.lax.scan(fold_body, comp0, rest, reverse=True)
            comps = tuple(
                jnp.concatenate([cr, c0[None]], axis=0)
                for cr, c0 in zip(comps_r, comp0)
            )  # [s-1, ...]: suffix composites for j = 0..s-2
        else:
            def fold_body(c, leaf_j):
                return _combine_leaf_full(leaf_j, c, nb2), None

            comp, _ = jax.lax.scan(fold_body, comp0, rest, reverse=True)
    elif emit:
        comps = tuple(c0[None] for c0 in comp0)

    eta_s, J_s = _suffix_pj(comp, nb2, em=True)  # suffix at chunk starts
    # Interior seeds: the NEXT chunk's boundary suffix; zeros for the last
    # chunk (annihilated by the terminal leaf's zeroed dynamics).
    shift = lambda x: _cat(
        [
            x[(Ellipsis, slice(1, None), slice(None))],
            jnp.zeros_like(x[(Ellipsis, slice(0, 1), slice(None))]),
        ],
        em=True,
    )
    eta_v, J_v = shift(eta_s), shift(J_s)

    def unchunk_s(y):
        # Scan-stacked [s, .., C, B] -> [.., N, B] (inverse of chunkify).
        y = jnp.moveaxis(y, 0, -2)
        return y.reshape(y.shape[:-3] + (N, y.shape[-1]))

    if emit:
        # Batched interior recovery (pscan_batched_interior): every
        # in-chunk cost-to-go j = 0..s-2 is one reduced combine of the
        # emitted suffix composite against the chunk's seed — a SINGLE
        # _combine_reduced call at [C*(s-1)*B] lane width replaces the
        # s-1-step serial down-sweep (measured 31% kernel efficiency at
        # [C*B] = 2048 lanes). j = s-1 is a single batched Woodbury leaf
        # step. Gains then come from one full-width _gains_from pass.
        sm1 = s - 1

        def flat_j(y):
            # [s-1, .., C, B] -> [.., C*(s-1), B], chunk-major j-minor.
            y = jnp.moveaxis(y, 0, -2)
            return y.reshape(y.shape[:-3] + (C * sm1, y.shape[-1]))

        rep = lambda x: jnp.repeat(x, sm1, axis=-2)
        eta_i, J_i = _combine_reduced(
            tuple(flat_j(x) for x in comps), (rep(eta_v), rep(J_v)), nb2
        )
        eta_l, J_l = _combine_reduced_leaf(lj(s - 1), (eta_v, J_v), nb2)
        uf = lambda y: y.reshape(y.shape[:-2] + (C, sm1, y.shape[-1]))
        ex = lambda y: y[(Ellipsis, slice(None), None, slice(None))]
        fin = lambda yi, yl: jnp.concatenate(
            [uf(yi), ex(yl)], axis=-2
        ).reshape(yi.shape[:-2] + (N, yi.shape[-1]))
        P_all, p_all = fin(J_i, J_l), -fin(eta_i, eta_l)
        S = lambda x: x[(Ellipsis, slice(0, N - 1), slice(None))]
        Sn = lambda x: x[(Ellipsis, slice(1, N), slice(None))]
        K, d = _gains_from(
            S(pem["A"]), S(pem["B"]), S(pem["Rdiag"]), S(pem["r"]),
            S(pem["f"]), Sn(P_all), Sn(p_all), nb2, em=True,
        )
        return P_all, p_all, K, d

    if not gains:
        # Down-sweep as a reverse scan over in-chunk positions j = 1..s-1
        # (one compiled body; j = 0 is the scanned chunk-start suffix).
        rest = tuple(x[1:] for x in lc)

        def down_body(c, leaf_j):
            nxt = _combine_reduced_leaf(leaf_j, c, nb2)
            return nxt, nxt

        _, (etas_r, Js_r) = jax.lax.scan(
            down_body, (eta_v, J_v), rest, reverse=True
        )
        cat0 = lambda h, t: jnp.concatenate([h[None], t], axis=0)
        return (
            unchunk_s(cat0(J_s, Js_r)),
            -unchunk_s(cat0(eta_s, etas_r)),
        )

    # Fused gains: run the down-sweep at EVERY in-chunk position (j=0's
    # value recomputes the scanned chunk-start suffix — C cheap extra
    # steps) and emit (K, d) from the step's own Woodbury intermediates.
    rinv_c = chunkify(1.0 / pem["Rdiag"])
    r_c = chunkify(pem["r"])

    def gains_body(c, xs_j):
        leaf_j, rinv_j, r_j = xs_j
        eta_j, J_j, K_j, d_j = _combine_reduced_leaf(
            leaf_j, c, nb2, gains=(rinv_j, r_j)
        )
        return (eta_j, J_j), (eta_j, J_j, K_j, d_j)

    _, (etas_s, Js_s, Ks_s, ds_s) = jax.lax.scan(
        gains_body, (eta_v, J_v), (lc, rinv_c, r_c), reverse=True
    )
    Sl = lambda x: x[(Ellipsis, slice(0, N - 1), slice(None))]
    return (
        unchunk_s(Js_s),
        -unchunk_s(etas_s),
        Sl(unchunk_s(Ks_s)),
        Sl(unchunk_s(ds_s)),
    )


def _auto_chunk(N: int, chunk: int) -> int:
    """Resolve the pscan_chunk option: 0 = auto (8 when the horizon
    allows), 1 = unchunked, >= 2 = explicit (must divide N with >= 2
    chunks)."""
    if chunk == 0:
        # Measured on chip at the quadruped config (probe_chunk_ab.py,
        # N=512 nx=36 nu=12 B=128, round 5 with fused epilogues + scan
        # folds): s=32 > s=16 (3178 / 2750 solves/s; round 4: 16 > 8 > 4 >
        # unchunked at 2405 / 2315 / 2033 / 1351).
        for s in (32, 16, 8, 4):
            if N % s == 0 and N >= 64:
                return s
        return 1
    if chunk >= 2 and (N % chunk != 0 or N // chunk < 2):
        raise ValueError(
            f"pscan_chunk={chunk} must divide the horizon N={N} with at "
            "least two chunks"
        )
    return chunk


def _value_scan_em(pem, nb2: int, chunk: int = 0):
    """Element-major leaf construction + suffix scan: the counterpart of
    :func:`_value_scan` on ``[p, q, N, B]`` slabs (block dims leading, the
    (knot x batch) plane minor — dense (8, 128) tiles at any block size;
    see rslqr_em's layout rationale). ``pem`` is the dict of element-major
    problem arrays. Returns ``(P [n, n, N, B], p [n, N, B])``.

    The first scan level runs on STRUCTURED leaves (rank-m ``C``, diagonal
    ``J`` — :func:`_suffix_pj_leaf_em`), so the leaf ``C``/``J`` slabs of
    the generic path are never materialized.
    """
    A, B = pem["A"], pem["B"]
    n = A.shape[0]
    m = B.shape[1]
    N, Bb = A.shape[2], A.shape[3]
    dtype = A.dtype

    rinv = 1.0 / pem["Rdiag"]  # [m, N, B]
    Brinv = B * rinv[None]  # scale B's columns by 1/R
    Bt = jnp.swapaxes(B, 0, 1)

    S = lambda x, sl: x[(Ellipsis, sl, slice(None))]
    c_dyn = S(pem["f"], slice(0, N - 1)) - la.bgemv(
        S(Brinv, slice(0, N - 1)), S(pem["r"], slice(0, N - 1)), nb2
    )
    if N >= 4 and N % 2 == 0:
        s = _auto_chunk(N, chunk)
        if s >= 2:
            return _value_scan_chunked_em(pem, nb2, s)
        eta_all, J_all = _suffix_pj_leaf_em(_leaf_em(pem, nb2), nb2)
        return J_all, -eta_all

    F = S(A, slice(0, N - 1))
    c = c_dyn
    C = S(la.bgemm(Brinv, Bt, nb2), slice(0, N - 1))
    eta = -S(pem["q"], slice(0, N - 1))
    diag = (jnp.arange(n), jnp.arange(n))
    Jq = jnp.zeros((n, n, N - 1, Bb), dtype).at[diag].set(
        S(pem["Qdiag"], slice(0, N - 1))
    )

    zF = jnp.zeros((n, n, 1, Bb), dtype)
    JN = jnp.zeros((n, n, 1, Bb), dtype).at[diag].set(
        S(pem["Qdiag"], slice(N - 1, N))
    )
    zv = jnp.zeros((n, 1, Bb), dtype)
    elems = (
        _cat([F, zF], em=True),
        _cat([c, zv], em=True),
        _cat([C, zF], em=True),
        _cat([eta, -S(pem["q"], slice(N - 1, N))], em=True),
        _cat([Jq, JN], em=True),
    )
    eta_all, J_all = _suffix_pj(elems, nb2, em=True)
    return J_all, -eta_all


def _prefix_action_em(Phi, tvec, x0, nb2: int) -> jax.Array:
    """Element-major twin of :func:`_prefix_action`: scan axis -2, keepdims
    slicing; ``x0`` carries a unit scan axis ``[n, 1, B]``."""
    S = lambda x, sl: x[(Ellipsis, sl, slice(None))]
    L = Phi.shape[-2]
    if L == 1:
        return la.bgemv(Phi, x0, nb2) + tvec
    if L % 2 == 1:
        head = _prefix_action_em(
            S(Phi, slice(0, -1)), S(tvec, slice(0, -1)), x0, nb2
        )
        last = (
            la.bgemv(S(Phi, slice(-1, None)), S(head, slice(-1, None)), nb2)
            + S(tvec, slice(-1, None))
        )
        return _cat([head, last], em=True)
    Phi_e, Phi_o = _even_odd(Phi, em=True)
    t_e, t_o = _even_odd(tvec, em=True)
    Phi_c = la.bgemm(Phi_o, Phi_e, nb2)
    t_c = la.bgemv(Phi_o, t_e, nb2) + t_o
    a_pair = _prefix_action_em(Phi_c, t_c, x0, nb2)  # a_{2i+1}
    a0 = la.bgemv(S(Phi_e, slice(0, 1)), x0, nb2) + S(t_e, slice(0, 1))
    if L > 2:
        a_even_rest = (
            la.bgemv(S(Phi_e, slice(1, None)), S(a_pair, slice(0, -1)), nb2)
            + S(t_e, slice(1, None))
        )
        a_even = _cat([a0, a_even_rest], em=True)
    else:
        a_even = a0
    return _interleave(a_even, a_pair, em=True)


def _prefix_action_chunked_em(
    Phi, tvec, x0, nb2: int, s: int, batched: bool = False
) -> jax.Array:
    """Chunked twin of :func:`_prefix_action_em`: serial within-chunk map
    composition (one gemm per step) builds one affine composite per
    ``s``-step chunk, the odd-even prefix runs over only L/s composites,
    and interior states follow by ``s`` serial gemv steps from each
    chunk-start state. Same glue rationale as the chunked value scan:
    contiguous ``[s, ...]`` slabs replace strided splits/interleaves.
    Pads with identity maps when ``s`` does not divide ``L``.
    """
    L = Phi.shape[-2]
    pad = (-L) % s
    if pad:
        n = Phi.shape[0]
        eyes = jnp.zeros(
            (n, n, pad) + Phi.shape[3:], Phi.dtype
        ).at[(jnp.arange(n), jnp.arange(n))].set(1.0)
        Phi = _cat([Phi, eyes], em=True)
        tvec = _cat(
            [tvec, jnp.zeros((n, pad) + tvec.shape[2:], tvec.dtype)], em=True
        )
    Lp = L + pad
    C = Lp // s

    def chunkify(x):
        y = x.reshape(x.shape[:-2] + (C, s, x.shape[-1]))
        return jnp.moveaxis(y, -2, 0)

    Phc, tc = chunkify(Phi), chunkify(tvec)

    if batched:
        # Emit the fold's carries: ys[k] is the within-chunk PREFIX
        # composite covering steps 0..k+1 (k = 0..s-2); with the init
        # (step 0 alone) prepended, entry j of the stack maps the chunk
        # start to x_{cs+j+1}. Interior states then follow from ONE
        # batched gemv at [C*(s-1)*B] width instead of s serial steps.
        def comp_body(c, xs_j):
            Phi_j, t_j = xs_j
            nxt = (
                la.bgemm(Phi_j, c[0], nb2),
                la.bgemv(Phi_j, c[1], nb2) + t_j,
            )
            return nxt, nxt

        (Phi_c, t_c), (Phs, ts) = jax.lax.scan(
            comp_body, (Phc[0], tc[0]), (Phc[1:], tc[1:])
        )
        ends = _prefix_action_em(Phi_c, t_c, x0, nb2)  # x_{(k+1)s}
        starts = _cat(
            [x0, ends[(Ellipsis, slice(0, C - 1), slice(None))]], em=True
        )
        sm1 = s - 1
        Php = jnp.concatenate([Phc[0][None], Phs[: sm1 - 1]], axis=0)
        tp = jnp.concatenate([tc[0][None], ts[: sm1 - 1]], axis=0)

        def flat_j(y):  # [s-1, .., C, B] -> [.., C*(s-1), B]
            y = jnp.moveaxis(y, 0, -2)
            return y.reshape(y.shape[:-3] + (C * sm1, y.shape[-1]))

        xi = la.bgemv(
            flat_j(Php), jnp.repeat(starts, sm1, axis=-2), nb2
        ) + flat_j(tp)
        xi = xi.reshape(xi.shape[:-2] + (C, sm1, xi.shape[-1]))
        out = jnp.concatenate(
            [xi, ends[(Ellipsis, slice(None), None, slice(None))]], axis=-2
        )
        out = out.reshape(out.shape[:-3] + (Lp, out.shape[-1]))
        return out[(Ellipsis, slice(0, L), slice(None))]

    def comp_body(c, xs_j):
        Phi_j, t_j = xs_j
        return (
            la.bgemm(Phi_j, c[0], nb2),
            la.bgemv(Phi_j, c[1], nb2) + t_j,
        ), None

    (Phi_c, t_c), _ = jax.lax.scan(
        comp_body, (Phc[0], tc[0]), (Phc[1:], tc[1:])
    )
    ends = _prefix_action_em(Phi_c, t_c, x0, nb2)  # x_{(k+1)s} [n, C, B]
    starts = _cat(
        [x0, ends[(Ellipsis, slice(0, C - 1), slice(None))]], em=True
    )

    def step_body(xv, xs_j):
        Phi_j, t_j = xs_j
        xn = la.bgemv(Phi_j, xv, nb2) + t_j  # x_{ks+j+1}
        return xn, xn

    _, xs = jax.lax.scan(step_body, starts, (Phc, tc))
    out = jnp.moveaxis(xs, 0, -2)
    out = out.reshape(out.shape[:-3] + (Lp, out.shape[-1]))
    return out[(Ellipsis, slice(0, L), slice(None))]


def _solve_pscan_em(
    prob: LQRProblem, nb: int, chunk: int = 0, batched_interior: bool = False
) -> RiccatiSolution:
    """Mid-block production path: the whole scan in element-major layout.

    Every element component is a ``[p, q, N, B]`` slab whose (knot x batch)
    plane rides the (sublane, lane) tiles densely — mat-last layouts occupy
    36/128 lanes at the quadruped size, and XLA's batched LU there runs at
    single-digit GFLOP/s. All combine algebra flows through
    :mod:`rslqr_tpu.linalg` with ``nbatch = 2``, where the mid-block gemms
    dispatch to the element-plane Pallas kernels (ops/planes_pallas.py) and
    the ``I + C J`` solves to the blocked batch-last LU whose O(n^3) bulk
    is those same kernels. Requires one flattened leading batch axis.
    """
    # Batch-last then element-major: [B?, N, p, q] -> [N, p, q, B] -> move
    # the knot axis second-minor -> [p, q, N, B].
    def bl(x):
        perm = tuple(range(nb, x.ndim)) + tuple(range(nb))
        return jnp.transpose(x, perm)

    pbl = jax.tree.map(bl, prob)
    em = lambda x: jnp.moveaxis(x, 0, -2)
    pem = {
        "A": em(pbl.A),
        "B": em(pbl.B),
        "f": em(pbl.f),
        "q": em(pbl.q),
        "r": em(pbl.r),
        "Qdiag": em(pbl.Qdiag),
        "Rdiag": em(pbl.Rdiag),
    }
    nb2 = 2
    N = pem["A"].shape[2]
    S = lambda x, sl: x[(Ellipsis, sl, slice(None))]

    s = _auto_chunk(N, chunk) if (N >= 4 and N % 2 == 0) else 1
    if s >= 2:
        # Chunked scan with gains fused into its down-sweep (no separate
        # Quu/Qux gemms, Cholesky, or P[1:]-slab read).
        P, p, K, d = _value_scan_chunked_em(
            pem, nb2, s, gains=True, batched=batched_interior
        )
    else:
        P, p = _value_scan_em(pem, nb2, 1)
        K, d = _gains_from(
            S(pem["A"], slice(0, N - 1)),
            S(pem["B"], slice(0, N - 1)),
            S(pem["Rdiag"], slice(0, N - 1)),
            S(pem["r"], slice(0, N - 1)),
            S(pem["f"], slice(0, N - 1)),
            S(P, slice(1, N)),
            S(p, slice(1, N)),
            nb2,
            em=True,
        )
    Phi = S(pem["A"], slice(0, N - 1)) + la.bgemm(
        S(pem["B"], slice(0, N - 1)), K, nb2
    )
    tvec = la.bgemv(S(pem["B"], slice(0, N - 1)), d, nb2) + S(
        pem["f"], slice(0, N - 1)
    )
    x0e = pbl.x0[:, None, :] if nb else pbl.x0[:, None]
    if s >= 2:
        xs = _prefix_action_chunked_em(
            Phi, tvec, x0e, nb2, s, batched=batched_interior
        )
    else:
        xs = _prefix_action_em(Phi, tvec, x0e, nb2)
    X = _cat([x0e, xs], em=True)  # [n, N, B]
    U = la.bgemv(K, S(X, slice(0, N - 1)), nb2) + d
    Y = la.bgemv(P, X, nb2) + p

    # Element-major [p(, q), N, B] -> knot-major [N, p(, q), B] -> leading
    # batch.
    def out(x):
        x = jnp.moveaxis(x, -2, 0)
        if nb == 0:
            return x
        nd = x.ndim
        perm = (nd - 1,) + tuple(range(nd - 1))
        return jnp.transpose(x, perm)

    return RiccatiSolution(
        K=out(K), d=out(d), P=out(P), p=out(p), X=out(X), U=out(U), Y=out(Y)
    )


def solve_pscan(prob: LQRProblem, options=None) -> RiccatiSolution:
    """Full parallel-scan LQR solve; same outputs as :func:`solve_riccati`.

    Accepts a single problem or a leading-batch problem pytree (like
    :func:`rslqr_tpu.rslqr.solve`); batch axes are carried on the TPU lane
    dimension internally. Large-block batches (past the lane-kernel
    threshold) are instead ``vmap``-ed over the scenario axis: at nbatch=0
    every mat-last transpose in :mod:`rslqr_tpu.linalg` is the identity, so
    vmap turns the whole solve into natively-batched MXU ``dot_general`` /
    LU ops with zero per-op transposes — the large-block fast path
    (the reference's any-size backend dispatch role, linalg.c:153-190).

    ``options`` (:class:`rslqr_tpu.config.SolveOptions`) pins the dispatch
    per call; ``None`` snapshots the global config at trace time. For this
    family ``layout="grid"`` forces the batch-last path (no vmap re-route).
    """
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        return _solve_pscan_impl(prob, opts)


def _solve_pscan_impl(prob: LQRProblem, opts) -> RiccatiSolution:
    nb = prob.A.ndim - 3
    n_, m_ = prob.A.shape[-2], prob.B.shape[-1]

    if nb and max(n_, m_) > la.small_block_threshold():
        # Mid-block dispatch: element-major scan when the element-plane
        # kernels engage (or layout="em" forces it); else the vmap MXU
        # path ("auto" off-TPU) — "grid" pins the plain batch-last path.
        pi = la._planes_interpret()
        lane_ok = pi is True or prob.A.shape[0] % 128 == 0
        mid_em = (
            nb == 1
            and n_ <= 64
            and m_ <= 64
            and (
                opts.layout == "em"
                or (opts.layout == "auto" and pi is not None and lane_ok)
            )
        )
        if mid_em:
            return _solve_pscan_em(
                prob, nb, opts.pscan_chunk, opts.pscan_batched_interior
            )
        if opts.layout == "auto":
            bshape = prob.A.shape[:nb]
            flat = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[nb:]), prob
            )
            sol = jax.vmap(lambda p: _solve_pscan_impl(p, opts))(flat)
            return jax.tree.map(
                lambda x: x.reshape(bshape + x.shape[1:]), sol
            )

    def bl(x):
        if nb == 0:
            return x
        perm = tuple(range(nb, x.ndim)) + tuple(range(nb))
        return jnp.transpose(x, perm)

    def bf(x):
        if nb == 0:
            return x
        nd = x.ndim
        perm = tuple(range(nd - nb, nd)) + tuple(range(nd - nb))
        return jnp.transpose(x, perm)

    pbl = jax.tree.map(bl, prob)
    P, p = _value_scan(pbl, nb)
    K, d = _gains(pbl, P, p, nb)
    X = _forward_scan(pbl, K, d, nb)
    U = la.bgemv(K, X[:-1], nb) + d
    Y = la.bgemv(P, X, nb) + p
    return RiccatiSolution(
        K=bf(K), d=bf(d), P=bf(P), p=bf(p), X=bf(X), U=bf(U), Y=bf(Y)
    )


def solve_pscan_kkt(prob: LQRProblem, options=None) -> jax.Array:
    """Solve and return flat KKT vector(s) in the reference layout."""
    sol = solve_pscan(prob, options=options)
    return pack_solution(sol.Y, sol.X, sol.U)

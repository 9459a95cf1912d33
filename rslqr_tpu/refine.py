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
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    options=None,
) -> rslqr.RsLqrSolution:
    """rsLQR solve with ``solve_dtype`` factorization refined to the
    precision of ``prob``'s dtype (pass a float64 problem for full accuracy).

    Jittable (needs x64 enabled for f64 refinement); batch axes as usual.
    ``options`` (:class:`rslqr_tpu.config.SolveOptions`) pins layout/kernel
    dispatch per call, as in :func:`rslqr_tpu.rslqr.solve`.
    """
    from . import linalg as la
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        return _solve_refined_impl(prob, iterations, solve_dtype, tables, opts)


def _solve_refined_impl(
    prob, iterations, solve_dtype, tables, opts
) -> rslqr.RsLqrSolution:
    nb = prob.A.ndim - 3
    t = tables or build_tree_tables(prob.A.shape[-3])

    pbl_hi = rslqr._to_batch_last(prob, nb)
    pbl_lo = pbl_hi.astype(solve_dtype)

    if rslqr._use_em_layout(prob, opts):
        # Element-major production path: factor once, re-solve per iteration
        # through the EM RHS sweep (layout conversions touch vectors only).
        from . import rslqr_em

        A_lo, B_lo = rslqr_em._em(pbl_lo.A), rslqr_em._em(pbl_lo.B)
        fact, rhs_em = rslqr_em.factorize_em(
            prob.astype(solve_dtype), t, options=opts
        )

        def resolve(rhs_bl):
            zy, zx, zu = (rslqr_em._emv(v) for v in rhs_bl)
            for level in range(t.depth):
                zy, zx, zu = rslqr_em._rhs_level_em(
                    A_lo, B_lo, level, fact.Fls[level], fact.Fxs[level],
                    fact.Fus[level], fact.chols[level], zy, zx, zu, nb,
                    options=opts,
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


# ---------------------------------------------------------------------------
# Host-resident f64 refinement: the TPU route to the reference's 1e-6 bar.
#
# TPU has no native float64, so the "evaluate the residual in f64" half of
# mixed-precision refinement runs in numpy on the HOST, while the heavy
# factor/solve half stays on device in f32. Per iteration that costs two
# compact trajectory transfers (KKT-vector sized) — the production pattern
# for serving f64-accurate solutions off f32 hardware. The reference's
# benchmark asserts accuracy and speed in the same run
# (test/sample_problem_test.c:140-157); bench.py uses this to do the same.
# ---------------------------------------------------------------------------


def _refine_factor_init_impl(prob, options):
    """Device half: factorization + initial f32 solve. Returns
    ``(fact, (zy, zx, zu))`` batch-last (zu keeps the terminal scratch
    row)."""
    from . import linalg as la
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), la.pallas_ctx(opts.pallas):
        nb = prob.A.ndim - 3
        t = build_tree_tables(prob.A.shape[-3])
        pbl = rslqr._to_batch_last(prob, nb)
        if rslqr._use_em_layout(prob, opts):
            from . import rslqr_em

            fact, rhs_em = rslqr_em.factorize_em(prob, t, options=opts)
            zy, zx, zu = rhs_em
            A_em, B_em = rslqr_em._em(pbl.A), rslqr_em._em(pbl.B)
            for level in range(t.depth):
                zy, zx, zu = rslqr_em._rhs_level_em(
                    A_em, B_em, level, fact.Fls[level], fact.Fxs[level],
                    fact.Fus[level], fact.chols[level], zy, zx, zu, nb,
                    options=opts,
                )
            return fact, tuple(rslqr_em._emv_bl(v) for v in (zy, zx, zu))
        fact, rhs = rslqr._factorize_bl(pbl, t, nb)
        return fact, rslqr._solve_rhs_bl(pbl, fact, rhs, t)


_refine_factor_init_jit = jax.jit(
    _refine_factor_init_impl, static_argnames=("options",)
)


def _refine_resolve_impl(prob, fact, r_bl, options):
    """Device half of one refinement step: leaf-transform the (f32) residual
    and solve it with the cached factorization."""
    from . import linalg as la
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), la.pallas_ctx(opts.pallas):
        nb = prob.A.ndim - 3
        t = build_tree_tables(prob.A.shape[-3])
        pbl = rslqr._to_batch_last(prob, nb)
        r_lo = rslqr._leaf_rhs_transform(pbl, r_bl, nb)
        from . import rslqr_em

        if isinstance(fact, rslqr_em.EmFactorization):
            zy, zx, zu = rslqr_em.em_rhs_from_bl(r_lo)
            A_em, B_em = rslqr_em._em(pbl.A), rslqr_em._em(pbl.B)
            for level in range(t.depth):
                zy, zx, zu = rslqr_em._rhs_level_em(
                    A_em, B_em, level, fact.Fls[level], fact.Fxs[level],
                    fact.Fus[level], fact.chols[level], zy, zx, zu, nb,
                    options=opts,
                )
            return tuple(rslqr_em._emv_bl(v) for v in (zy, zx, zu))
        return rslqr._solve_rhs_bl(pbl, fact, r_lo, t)


_refine_resolve_jit = jax.jit(
    _refine_resolve_impl, static_argnames=("options",)
)


def _np_kkt_residual_rhs(p, Y, X, U):
    """numpy float64 KKT residual ``b - K s`` in (ry, rx, ru) block form.

    Leading-batch arrays ``[*b, N, n|m]``; ``U`` carries the terminal
    scratch row (zeroed in the output). Block rows per refine.kkt_apply."""
    A, B = p["A"][..., :-1, :, :], p["B"][..., :-1, :, :]
    mv = lambda M, v: np.einsum("...kij,...kj->...ki", M, v)
    mtv = lambda M, v: np.einsum("...kji,...kj->...ki", M, v)
    My = np.concatenate(
        [-X[..., :1, :], mv(A, X[..., :-1, :]) + mv(B, U[..., :-1, :]) - X[..., 1:, :]],
        axis=-2,
    )
    Mx = -Y + p["Qdiag"] * X
    Mx[..., :-1, :] += mtv(A, Y[..., 1:, :])
    Mu = p["Rdiag"] * U
    Mu[..., :-1, :] += mtv(B, Y[..., 1:, :])
    by = np.concatenate(
        [-p["x0"][..., None, :], -p["f"][..., :-1, :]], axis=-2
    )
    ry = by - My
    rx = -p["q"] - Mx
    ru = -p["r"] - Mu
    ru[..., -1, :] = 0.0
    res = max(
        np.max(np.abs(ry)), np.max(np.abs(rx)), np.max(np.abs(ru[..., :-1, :]))
    )
    return (ry, rx, ru), float(res)


def _np_pack_solution(Y, X, U):
    """numpy twin of problem.pack_solution (leading batch)."""
    N = X.shape[-2]
    batch = X.shape[:-2]
    body = np.concatenate(
        [Y[..., : N - 1, :], X[..., : N - 1, :], U], axis=-1
    ).reshape(batch + (-1,))
    tail = np.concatenate([Y[..., N - 1, :], X[..., N - 1, :]], axis=-1)
    return np.concatenate([body, tail], axis=-1)


# ---------------------------------------------------------------------------
# Device-resident double-float refinement: f64-accurate solves at f32 rates.
#
# solve_refined_host pays two compact host round trips per iteration, which
# on the remote-TPU tunnel costs seconds per batched solve (~193 solves/s
# measured, BENCH_r04 refined_f64_detail). This path instead evaluates the
# f64 residual ON DEVICE in double-float ("two-float" compensated)
# arithmetic: every f64 quantity is an (hi, lo) pair of f32 planes with
# value hi + lo and |lo| <= ulp(hi)/2, giving ~2^-48 relative accuracy —
# comfortably below the 1e-6 reference bar and at the 1e-10..1e-12 level
# the host path reaches. The whole refined solve (factor + initial solve +
# K iterations of residual/correct) is ONE jitted device program; the host
# sees only the final trajectory.
#
# The error-term algebra (Dekker/Knuth TwoSum/TwoProd) relies on IEEE f32
# adds/multiplies; XLA does not reassociate floating-point expressions, and
# all ops here are elementwise VPU ops (the matmul-precision knobs affect
# only dot_general). Ref accuracy contract: test/sample_problem_test.c:150.
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_renorm(s, e):
    hi = s + e
    return hi, e - (hi - s)


def _two_prod(a, b):
    # Dekker split at 2^12 + 1 (f32 has 24 mantissa bits).
    p = a * b
    ca, cb = a * 4097.0, b * 4097.0
    ah = ca - (ca - a)
    al = a - ah
    bh = cb - (cb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _df(hi, lo=None):
    return (hi, jnp.zeros_like(hi) if lo is None else lo)


def _df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    return _quick_renorm(s, e + x[1] + y[1])


def _df_neg(x):
    return (-x[0], -x[1])


def _df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    return _quick_renorm(p, e + x[0] * y[1] + x[1] * y[0])


def _df_kkt_residual(phi, plo, Yd, Xd, Ud, nb):
    """Double-float KKT residual ``b - K s`` (block rows per kkt_apply),
    batch-last; returns ((ry, rx, ru) f32 hi planes, max|r|).

    ``phi``/``plo`` are the (hi, lo) problem pytrees; ``Yd``/``Xd``/``Ud``
    are (hi, lo) solution pairs with the terminal u scratch row.
    """
    def dfm(Mh, Ml, vd, transpose=False):
        # [K,p,q,*b] (hi,lo) @ [K,q,*b] df -> [K,p,*b] df, unrolled over q.
        p_dim = Mh.shape[-(nb + 1)] if transpose else Mh.shape[-(nb + 2)]
        q_dim = Mh.shape[-(nb + 2)] if transpose else Mh.shape[-(nb + 1)]
        idx = lambda M, i, j: M[
            (Ellipsis,) + ((j, i) if transpose else (i, j))
            + (slice(None),) * nb
        ]
        vh, vl = vd
        vat = lambda j: (
            vh[(Ellipsis, j) + (slice(None),) * nb],
            vl[(Ellipsis, j) + (slice(None),) * nb],
        )
        outs_h, outs_l = [], []
        for i in range(p_dim):
            acc = _df_mul((idx(Mh, i, 0), idx(Ml, i, 0)), vat(0))
            for j in range(1, q_dim):
                acc = _df_add(
                    acc, _df_mul((idx(Mh, i, j), idx(Ml, i, j)), vat(j))
                )
            outs_h.append(acc[0])
            outs_l.append(acc[1])
        ax = -(nb + 1)
        return (
            jnp.stack(outs_h, axis=ax), jnp.stack(outs_l, axis=ax)
        )

    cat = lambda ads, axis=0: (
        jnp.concatenate([a[0] for a in ads], axis=axis),
        jnp.concatenate([a[1] for a in ads], axis=axis),
    )
    Ad = (phi.A[:-1], plo.A[:-1])
    Bd = (phi.B[:-1], plo.B[:-1])
    X_head = (Xd[0][:-1], Xd[1][:-1])
    U_head = (Ud[0][:-1], Ud[1][:-1])
    X_tail = (Xd[0][1:], Xd[1][1:])
    Y_tail = (Yd[0][1:], Yd[1][1:])

    # y rows: [-x_0; A x + B u - x_+].
    dyn = _df_add(
        _df_add(dfm(*Ad, X_head), dfm(*Bd, U_head)), _df_neg(X_tail)
    )
    My = cat([(_df_neg((Xd[0][:1], Xd[1][:1]))), dyn])
    # x rows: -y + Q x + A' y_+ (A' term absent at the terminal knot).
    Qx = _df_mul((phi.Qdiag, plo.Qdiag), Xd)
    Mx = _df_add(_df_neg(Yd), Qx)
    AtY = dfm(*Ad, Y_tail, transpose=True)
    Mx = cat([_df_add((Mx[0][:-1], Mx[1][:-1]), AtY),
              (Mx[0][-1:], Mx[1][-1:])])
    # u rows: R u + B' y_+.
    Ru = _df_mul((phi.Rdiag, plo.Rdiag), Ud)
    BtY = dfm(*Bd, Y_tail, transpose=True)
    Mu = cat([_df_add((Ru[0][:-1], Ru[1][:-1]), BtY),
              (Ru[0][-1:], Ru[1][-1:])])

    by = cat([(_df_neg((phi.x0[None], plo.x0[None]))),
              (_df_neg((phi.f[:-1], plo.f[:-1])))])
    ry = _df_add(by, _df_neg(My))
    rx = _df_add(_df_neg((phi.q, plo.q)), _df_neg(Mx))
    ru = _df_add(_df_neg((phi.r, plo.r)), _df_neg(Mu))
    ru = (ru[0].at[-1].set(0.0), ru[1].at[-1].set(0.0))
    res = jnp.maximum(
        jnp.max(jnp.abs(ry[0] + ry[1])),
        jnp.maximum(
            jnp.max(jnp.abs(rx[0] + rx[1])),
            jnp.max(jnp.abs(ru[0][:-1] + ru[1][:-1])),
        ),
    )
    return (ry[0] + ry[1], rx[0] + rx[1], ru[0] + ru[1]), res


def _refine_df_impl(phi, plo, iterations, options):
    """Device program: f32 factor + initial solve, then ``iterations``
    double-float residual/correct steps. Returns ((Y,X,U) hi/lo pairs,
    residual)."""
    from . import linalg as la
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        nb = phi.A.ndim - 3
        fact, (zy, zx, zu) = _refine_factor_init_impl(phi, opts)
        Yd, Xd, Ud = _df(zy), _df(zx), _df(zu)
        phib = rslqr._to_batch_last(phi, nb)
        plob = rslqr._to_batch_last(plo, nb)
        res = jnp.asarray(jnp.inf, jnp.float32)
        for _ in range(iterations):
            (ry, rx, ru), res = _df_kkt_residual(
                phib, plob, Yd, Xd, Ud, nb
            )
            dy, dx, du = _refine_resolve_impl(phi, fact, (ry, rx, ru), opts)
            Yd = _df_add(Yd, _df(dy))
            Xd = _df_add(Xd, _df(dx))
            Ud = _df_add(Ud, _df(du))
        _, res = _df_kkt_residual(phib, plob, Yd, Xd, Ud, nb)
        return (Yd, Xd, Ud), res


_refine_df_jit = jax.jit(
    _refine_df_impl, static_argnames=("iterations", "options")
)


@functools.partial(jax.jit, static_argnames=("iterations", "options"))
def refined_kkt_device(prob: LQRProblem, iterations: int = 3, options=None):
    """Fully-jittable double-float refined solve: device problem in, packed
    KKT ``(hi, lo)`` device arrays + residual out — the production serving
    entry for f64-accurate batched solves.

    Unlike :func:`solve_refined_device` (which splits a numpy float64
    problem on the host — the right call for full-f64 *inputs*), this
    never leaves the device: the problem is taken at its device precision
    (``lo = 0``) and the refinement drives the residual of THAT problem to
    ~1e-10 — double-float accuracy of the stored problem, at f32 device
    rates with only scalar fetches. Returns ``(kkt_hi [*b, nvars],
    kkt_lo [*b, nvars], residual)``; the f64 solution is ``hi + lo``.
    """
    from .problem import pack_solution

    nb = prob.A.ndim - 3
    phi = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), prob)
    plo = jax.tree.map(jnp.zeros_like, phi)
    (Yd, Xd, Ud), res = _refine_df_impl(phi, plo, iterations, None)

    def bf(x):  # batch-last [N, p, *b] -> leading-batch [*b, N, p]
        if nb == 0:
            return x
        nd = x.ndim
        perm = tuple(range(nd - nb, nd)) + tuple(range(nd - nb))
        return jnp.transpose(x, perm)

    pack = lambda i: pack_solution(
        bf(Yd[i]), bf(Xd[i]), bf(Ud[i][:-1])
    )
    return pack(0), pack(1), res


def solve_refined_device(
    prob: LQRProblem, iterations: int = 3, options=None
):
    """f64-accurate rsLQR solve with the residuals evaluated ON DEVICE in
    double-float arithmetic — no per-iteration host round trips.

    Same contract as :func:`solve_refined_host` (pass a numpy float64
    problem; returns ``(kkt_f64 [*b, nvars], residual)``), at f32 device
    rates: the whole refined solve is one compiled program.
    """
    from .config import resolve_options

    opts = resolve_options(options)
    nb = prob.A.ndim - 3

    def hi_of(x):
        return jnp.asarray(np.asarray(x, np.float64).astype(np.float32))

    def lo_of(x):
        x64 = np.asarray(x, np.float64)
        hi = x64.astype(np.float32)
        return jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32))

    phi = jax.tree.map(hi_of, prob)
    plo = jax.tree.map(lo_of, prob)
    (Yd, Xd, Ud), res = _refine_df_jit(phi, plo, iterations, opts)

    def to_np64(d):  # batch-last (hi, lo) -> leading-batch numpy f64
        a = np.asarray(d[0], np.float64) + np.asarray(d[1], np.float64)
        return np.moveaxis(a, -1, 0) if nb else a

    Y, X, U = to_np64(Yd), to_np64(Xd), to_np64(Ud)
    return _np_pack_solution(Y, X, U[..., :-1, :]), float(res)


def solve_refined_host(
    prob: LQRProblem, iterations: int = 3, options=None
):
    """f64-accurate rsLQR solve on an f32-only backend (TPU).

    ``prob`` is ideally an :class:`LQRProblem` of **numpy float64** arrays
    (``read_lqr_problem_json(path, dtype=None)``), optionally with one
    leading batch axis: the full-precision data drives the host residuals
    while the device half sees a float32 cast. A float32 device problem
    also works, but then the data itself is already rounded and the
    achievable accuracy is that of the *rounded* problem. Factorization and
    every correction solve run on device in float32; the residual
    evaluations run in numpy float64 on the host. Returns
    ``(kkt_f64, residual)``: the packed KKT solution as a numpy float64
    array ``[*b, nvars]`` and the final host-evaluated max-norm KKT
    residual. 2-3 iterations reach ~1e-10 on the shipped problems —
    comfortably under the reference's 1e-6 assertion bar
    (test/sample_problem_test.c:150-157).
    """
    from .config import resolve_options

    opts = resolve_options(options)
    nb = prob.A.ndim - 3
    prob32 = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), prob
    )
    fact, (zy, zx, zu) = _refine_factor_init_jit(prob32, opts)

    def to_np(x):  # batch-last device -> leading-batch numpy f64
        a = np.asarray(x, dtype=np.float64)
        return np.moveaxis(a, -1, 0) if nb else a

    def to_dev(a):  # leading-batch numpy -> batch-last f32 device array
        a = np.moveaxis(a, 0, -1) if nb else a
        return jnp.asarray(a, dtype=jnp.float32)

    Y, X, U = to_np(zy), to_np(zx), to_np(zu)
    p64 = {
        "A": np.asarray(prob.A, np.float64),
        "B": np.asarray(prob.B, np.float64),
        "f": np.asarray(prob.f, np.float64),
        "q": np.asarray(prob.q, np.float64),
        "r": np.asarray(prob.r, np.float64),
        "Qdiag": np.asarray(prob.Qdiag, np.float64),
        "Rdiag": np.asarray(prob.Rdiag, np.float64),
        "x0": np.asarray(prob.x0, np.float64),
    }
    res = None
    for _ in range(iterations):
        (ry, rx, ru), res = _np_kkt_residual_rhs(p64, Y, X, U)
        dy, dx, du = _refine_resolve_jit(
            prob32, fact, (to_dev(ry), to_dev(rx), to_dev(ru)), opts
        )
        Y += to_np(dy)
        X += to_np(dx)
        U += to_np(du)
    _, res = _np_kkt_residual_rhs(p64, Y, X, U)
    return _np_pack_solution(Y, X, U[..., :-1, :]), res

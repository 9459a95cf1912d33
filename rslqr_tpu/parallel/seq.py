"""Horizon (sequence) sharding: knot points distributed over a mesh axis.

The TPU-native answer to the reference's core claim — parallelizing the LQR
horizon — at the multi-chip level (SURVEY §5.7/§5.8). Each device owns a
contiguous, power-of-two chunk of ``C = N/D`` knot points. Tree levels with
group span ``2^(L+1) <= C`` are completely device-local (the reference's
"leaves narrow to one" per-level parallelism, solve.c:68-134, maps to chunks
that never talk); only the top ``log2(D)`` levels exchange data, and then
only *boundary blocks*: each level's separators sit exactly at chunk
boundaries, so one ``all_gather`` of first/last-knot factor blocks per top
level (a few KB) feeds a redundantly-replicated separator solve, and every
Schur update stays local. Communication volume per solve is
O(D * log(D) * n^2 * batch_local) — independent of N.

Device-dependent index math (which global tree level a chunk-boundary knot
lives on) is resolved with masked one-hot writes driven by
``lax.axis_index``, since a shard_map body is a single program for all
devices.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import linalg as la
from ..problem import LQRProblem, pack_solution
from ..rslqr import (
    RsLqrSolution,
    _group,
    _lambda_mask,
    _leaf_solve,
    _rhs_level_core,
    _sweep_level_core,
    _ungroup,
)
from ..tree import build_tree_tables
from ..utils import log2_int


def _tz(x: int) -> int:
    """Trailing zeros of a positive integer."""
    return (x & -x).bit_length() - 1


def _local_leaf_solve(prob, d, C, D, depth, nb):
    """Per-device leaf solves (ref nested_dissection.c:10-105) on a local
    chunk of ``C`` knots, device index ``d`` (traced), ``D`` devices.

    ``prob`` arrays are the local shards: A ``[C, n, n, *b]`` etc., plus
    ``fprev``/``Aprev``-style halo terms passed in via the problem arrays
    themselves (the caller supplies ``f`` already shifted where needed).
    Returns local factor slabs and RHS vectors.
    """
    A, Bm = prob.A, prob.B
    n = A.shape[1]
    m = Bm.shape[2]
    b_shape = A.shape[3:]
    dtype = A.dtype
    is_dev0 = d == 0
    is_last = d == D - 1
    local_depth = log2_int(C)

    qinv = 1.0 / prob.Qdiag
    rinv = 1.0 / prob.Rdiag
    qcol = jnp.expand_dims(qinv, -(nb + 1))
    rcol = jnp.expand_dims(rinv, -(nb + 1))
    At = la.transpose_block(A, nb)
    Bt = la.transpose_block(Bm, nb)

    Fls = [jnp.zeros((C, n, n) + b_shape, dtype) for _ in range(depth)]
    Fxs = [jnp.zeros((C, n, n) + b_shape, dtype) for _ in range(depth)]
    Fus = [jnp.zeros((C, m, n) + b_shape, dtype) for _ in range(depth)]

    # --- RHS (ref solver.c:138-190, negated): zy[j] = -f[global k-1].
    # prob.f arrives pre-shifted by one knot (halo exchange done by caller):
    # fshift[j] = f[d*C + j - 1], with fshift[0] on device 0 = x0.
    zy = -prob.f  # caller passed the shifted array in the f slot
    zx = -prob.q
    zu = -prob.r

    # Common terms for global k >= 1 (all local knots except device 0 knot 0).
    dev0_knot = jnp.logical_and(is_dev0, jnp.arange(C) == 0)
    not0 = ~dev0_knot
    not0_v = not0.reshape((C, 1) + (1,) * nb)
    zx = jnp.where(not0_v, zx * qinv, zx)
    # zu scaling applies to 1 <= k < N-1; exclude global 0 and N-1.
    lastk = jnp.logical_and(is_last, jnp.arange(C) == C - 1)
    zu_mask = jnp.logical_and(not0, ~lastk).reshape((C, 1) + (1,) * nb)
    zu = jnp.where(zu_mask, zu * rinv, zu)

    # Own-dynamics blocks F[level(k), k] = {Q^-1 A', R^-1 B'} for 1<=k<N-1.
    QiAt = At * qcol
    RiBt = Bt * rcol
    own_state = jnp.where(not0.reshape((C, 1, 1) + (1,) * nb), QiAt, 0.0)
    # Local knots j < C-1 have uniform level tz(j+1); knot C-1 is handled
    # via a one-hot over the top levels below.
    for j in range(C - 1):
        lvl = _tz(j + 1)
        Fxs[lvl] = Fxs[lvl].at[j].set(own_state[j])
        Fus[lvl] = Fus[lvl].at[j].set(jnp.where(not0[j], RiBt[j], 0.0))
    # Chunk-last knot: global level log2(C) + tz(d+1), except device D-1
    # (global knot N-1 has no own dynamics). One-hot masked writes.
    for topl in range(local_depth, depth):
        hit = jnp.logical_and(
            _toplevel_hits(d, D, local_depth, topl), ~is_last
        )
        Fxs[topl] = Fxs[topl].at[C - 1].set(
            jnp.where(hit, QiAt[C - 1], Fxs[topl][C - 1])
        )
        Fus[topl] = Fus[topl].at[C - 1].set(
            jnp.where(hit, RiBt[C - 1], Fus[topl][C - 1])
        )

    # Previous-step blocks F[level(k-1), k] = {-Q_k^-1, 0} for k >= 1
    # (ref nested_dissection.c:92-102).
    eye = jnp.eye(n, dtype=dtype).reshape((n, n) + (1,) * nb)
    negQi = -eye * qcol  # [C, n, n, *b]
    for j in range(1, C):
        lvl = _tz(j)  # level(k-1) for local j>=1 is uniform
        Fxs[lvl] = Fxs[lvl].at[j].set(negQi[j])
    # Local j=0: prev knot is the previous chunk's last, level log2(C)+tz(d);
    # device 0 has no previous knot (knot 0 uses the k=0 special form).
    for topl in range(local_depth, depth):
        hit = jnp.logical_and(
            _toplevel_hits(d - 1, D, local_depth, topl), ~is_dev0
        )
        Fxs[topl] = Fxs[topl].at[0].set(
            jnp.where(hit, negQi[0], Fxs[topl][0])
        )

    # Global knot 0 specials (device 0 only, ref nested_dissection.c:24-58).
    Fls[0] = Fls[0].at[0].set(jnp.where(is_dev0, -At[0], Fls[0][0]))
    Fus[0] = Fus[0].at[0].set(jnp.where(is_dev0, RiBt[0], Fus[0][0]))
    zy0 = zy[0]
    zy = zy.at[0].set(jnp.where(is_dev0, -prob.Qdiag[0] * zy0 - zx[0], zy0))
    zx = zx.at[0].set(jnp.where(is_dev0, -zy0, zx[0]))
    zu = zu.at[0].set(jnp.where(is_dev0, zu[0] * rinv[0], zu[0]))

    return Fls, Fxs, Fus, zy, zx, zu


def _toplevel_hits(dd, D, local_depth, topl):
    """Traced predicate: does chunk-last knot of device ``dd`` live at global
    tree level ``topl``? level = local_depth + tz(dd+1) computed on trace."""
    v = dd + 1
    # tz(v) == topl - local_depth  <=>  v % 2^(t+1) == 2^t with t = topl-local_depth
    t = topl - local_depth
    return (v % (1 << (t + 1))) == (1 << t)


def _top_lambda_mask(d, C, E, nb):
    """Lambda-update mask for a top level: local knot 0 of devices with
    ``d % E == 0`` is a range start (masked), except global knot 0."""
    j0 = jnp.arange(C) == 0
    start = jnp.logical_and(j0, (d % E) == 0)
    keep = jnp.logical_or(~start, jnp.logical_and(d == 0, j0))
    return keep


@partial(jax.jit, static_argnames=("mesh", "sp_axis", "dp_axis", "options"))
def solve_seq_sharded(
    prob: LQRProblem,
    mesh: Mesh,
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
    options=None,
):
    """Horizon-sharded rsLQR solve over ``mesh[sp_axis]`` devices.

    ``prob`` may carry leading batch axes (sharded over ``dp_axis`` when
    given). Returns the flat KKT vector(s) ``[*batch, nvars]`` with the same
    values as :func:`rslqr_tpu.rslqr.solve_kkt`. ``options`` (a static
    :class:`rslqr_tpu.config.SolveOptions`) pins the linalg dispatch
    threshold per call.
    """
    from ..config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        return _solve_seq_sharded_impl(prob, mesh, sp_axis, dp_axis)


def _solve_seq_sharded_impl(
    prob: LQRProblem,
    mesh: Mesh,
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
):
    nb = prob.A.ndim - 3
    N = prob.A.shape[-3]
    D = mesh.shape[sp_axis]
    C = N // D
    if C * D != N or C < 2:
        raise ValueError(f"need N ({N}) divisible by devices ({D}) with chunk >= 2")
    depth = log2_int(N)
    local_depth = log2_int(C)

    # Batch-last internally (lane-friendly), knot axis leading.
    def bl(x):
        if nb == 0:
            return x
        perm = tuple(range(nb, x.ndim)) + tuple(range(nb))
        return jnp.transpose(x, perm)

    pbl = jax.tree.map(bl, prob)

    # The RHS needs f shifted by one knot with x0 in front (zy[k] = -f[k-1],
    # zy[0] = -x0; ref solver.c:138-176). Do it globally before sharding.
    fshift = jnp.concatenate([pbl.x0[None], pbl.f[:-1]], axis=0)
    pshift = dataclasses.replace(pbl, f=fshift)

    dp = dp_axis
    knot_spec = lambda ndim: P(*(sp_axis,) + (None,) * (ndim - 1 - (1 if dp else 0)) + ((dp,) if dp else ()))

    specs = jax.tree.map(lambda x: knot_spec(x.ndim), pshift)
    # x0 is replicated over sp (it has no knot axis).
    x0_spec = P(*(None,) * (pshift.x0.ndim - (1 if dp else 0)) + ((dp,) if dp else ()))
    specs = dataclasses.replace(specs, x0=x0_spec)

    out_vec_spec = P(*(sp_axis,) + (None,) * 1 + ((dp,) if dp else ()))

    def body(p):
        d = jax.lax.axis_index(sp_axis)
        Fls, Fxs, Fus, zy, zx, zu = _local_leaf_solve(p, d, C, D, depth, nb)

        chols = []  # local levels: [G_local, n, n, *b] per level
        # --- local tree levels (communication-free).
        for level in range(local_depth):
            _sweep_core_sharded_local(p, level, depth, Fls, Fxs, Fus, chols, nb, d)

        # --- top levels: boundary-block all_gather + replicated separator
        #     solves + local Schur updates.
        A_last = jax.lax.all_gather(p.A[C - 1], sp_axis)  # [D, n, n, *b]
        B_last = jax.lax.all_gather(p.B[C - 1], sp_axis)
        top_chols = []
        for level in range(local_depth, depth):
            E = (1 << level) // C
            span_dev = 2 * E  # devices per group
            G_top = D // span_dev
            a_dev = (2 * np.arange(G_top) + 1) * E - 1  # device of idx (static)
            b_dev = a_dev + 1  # device of idx+1

            lasts_x = jax.lax.all_gather(
                jnp.stack([Fxs[u][C - 1] for u in range(level, depth)]), sp_axis
            )  # [D, U, n, n, *b]
            lasts_u = jax.lax.all_gather(
                jnp.stack([Fus[u][C - 1] for u in range(level, depth)]), sp_axis
            )
            firsts_x = jax.lax.all_gather(
                jnp.stack([Fxs[u][0] for u in range(level, depth)]), sp_axis
            )
            firsts_l = jax.lax.all_gather(
                jnp.stack([Fls[u][0] for u in range(level, depth)]), sp_axis
            )

            # Inner products for all separators at this level, all fact
            # levels u >= level (ref nested_dissection.c:114-134): S has
            # shape [U, G_top, n, n, *b].
            S = (
                la.bgemm(A_last[a_dev][None], jnp.moveaxis(lasts_x[a_dev], 0, 1), nb)
                + la.bgemm(B_last[a_dev][None], jnp.moveaxis(lasts_u[a_dev], 0, 1), nb)
                - jnp.moveaxis(firsts_x[b_dev], 0, 1)
                - jnp.moveaxis(firsts_l[b_dev], 0, 1)
            )
            Lc = la.bcholesky(S[0], nb)  # [G_top, n, n, *b], replicated
            top_chols.append(Lc)
            g_my = d // span_dev
            if level + 1 < depth:
                fsol = la.bcho_solve(Lc[None], S[1:], nb)  # [U-1, G_top, ...]
                f_my = jax.lax.dynamic_index_in_dim(
                    jnp.moveaxis(fsol, 1, 0), g_my, axis=0, keepdims=False
                )  # [U-1, n, n, *b]

                # Write back fact[u][idx+1] on its owner (local knot 0 of
                # device b_g: d % span_dev == E).
                is_bg = (d % span_dev) == E
                for ui, u in enumerate(range(level + 1, depth)):
                    Fls[u] = Fls[u].at[0].set(
                        jnp.where(is_bg, f_my[ui], Fls[u][0])
                    )

                # Local Schur updates (ref solve.c:119-131).
                keep = _top_lambda_mask(d, C, E, nb)
                keep_m = keep.reshape((C, 1, 1) + (1,) * nb)
                for ui, u in enumerate(range(level + 1, depth)):
                    fu = f_my[ui][None]  # broadcast over local knots
                    upd_l = la.bgemm(Fls[level], fu, nb)
                    Fls[u] = Fls[u] - jnp.where(keep_m, upd_l, 0)
                    Fxs[u] = Fxs[u] - la.bgemm(Fxs[level], fu, nb)
                    Fus[u] = Fus[u] - la.bgemm(Fus[level], fu, nb)

        # --- RHS sweep (ref solve.c:137-182).
        for level in range(local_depth):
            zy, zx, zu = _rhs_level_core(
                p, level, Fls[level], Fxs[level], Fus[level],
                chols[level], zy, zx, zu, nb, knot0=(d == 0),
            )
        for li, level in enumerate(range(local_depth, depth)):
            E = (1 << level) // C
            span_dev = 2 * E
            G_top = D // span_dev
            a_dev = (2 * np.arange(G_top) + 1) * E - 1
            b_dev = a_dev + 1
            last_zx = jax.lax.all_gather(zx[C - 1], sp_axis)  # [D, n, *b]
            last_zu = jax.lax.all_gather(zu[C - 1], sp_axis)
            first_zx = jax.lax.all_gather(zx[0], sp_axis)
            first_zy = jax.lax.all_gather(zy[0], sp_axis)
            znew = (
                la.bgemv(A_last[a_dev], last_zx[a_dev], nb)
                + la.bgemv(B_last[a_dev], last_zu[a_dev], nb)
                - first_zx[b_dev]
                - first_zy[b_dev]
            )
            zbar = la.bcho_solve_vec(top_chols[li], znew, nb)  # [G_top, n, *b]
            g_my = d // span_dev
            zb_my = jax.lax.dynamic_index_in_dim(zbar, g_my, 0, keepdims=False)
            is_bg = (d % span_dev) == E
            zy = zy.at[0].set(jnp.where(is_bg, zb_my, zy[0]))
            keep = _top_lambda_mask(d, C, E, nb).reshape((C, 1) + (1,) * nb)
            fv = zb_my[None]
            zy = zy - jnp.where(keep, la.bgemv(Fls[level], fv, nb), 0)
            zx = zx - la.bgemv(Fxs[level], fv, nb)
            zu = zu - la.bgemv(Fus[level], fv, nb)

        # Assemble local slice of the interleaved KKT vector. The terminal
        # knot's layout difference (no input block) is handled globally by
        # pack_solution after the shard_map.
        return zy, zx, zu

    zspec = knot_spec(pshift.q.ndim)
    zy, zx, zu = jax.shard_map(
        body, mesh=mesh, in_specs=(specs,), out_specs=(zspec, zspec, zspec),
    )(pshift)

    def bf(x):
        if nb == 0:
            return x
        nd = x.ndim
        perm = tuple(range(nd - nb, nd)) + tuple(range(nd - nb))
        return jnp.transpose(x, perm)

    return pack_solution(bf(zy), bf(zx), bf(zu[:-1]))


def _sweep_core_sharded_local(p, level, depth, Fls, Fxs, Fus, chols, nb, d):
    """Local-level sweep with the knot-0 lambda exemption made device-aware."""
    from .. import rslqr as _r

    C = p.A.shape[0]
    span = 1 << (level + 1)
    mid = (1 << level) - 1
    A_g = _group(p.A, span)[:, mid]
    B_g = _group(p.B, span)[:, mid]

    Lc = None
    fsols = {}
    for u in range(level, depth):
        gl = _group(Fls[u], span)
        gx = _group(Fxs[u], span)
        gu = _group(Fus[u], span)
        S = (
            la.bgemm(A_g, gx[:, mid], nb)
            + la.bgemm(B_g, gu[:, mid], nb)
            - gx[:, mid + 1]
            - gl[:, mid + 1]
        )
        if u == level:
            Lc = la.bcholesky(S, nb)
            chols.append(Lc)
            Snew = S
        else:
            Snew = la.bcho_solve(Lc, S, nb)
            fsols[u] = Snew
        Fls[u] = _ungroup(gl.at[:, mid + 1].set(Snew))

    if level + 1 < depth:
        # Static intra-chunk mask; the knot-0 exemption applies on device 0
        # only (traced), so splice it in with a where.
        base = np.ones((C // span, span), dtype=bool)
        base[:, 0] = False
        base[:, mid + 1] = False
        mask = jnp.asarray(base)
        mask = mask.at[0, 0].set(d == 0)
        mask = mask.reshape((C // span, span, 1, 1) + (1,) * nb)
        FL_l = _group(Fls[level], span)
        FL_x = _group(Fxs[level], span)
        FL_u = _group(Fus[level], span)
        for u in range(level + 1, depth):
            f_u = fsols[u][:, None]
            upd_l = la.bgemm(FL_l, f_u, nb)
            Fls[u] = _ungroup(_group(Fls[u], span) - jnp.where(mask, upd_l, 0))
            Fxs[u] = _ungroup(_group(Fxs[u], span) - la.bgemm(FL_x, f_u, nb))
            Fus[u] = _ungroup(_group(Fus[u], span) - la.bgemm(FL_u, f_u, nb))

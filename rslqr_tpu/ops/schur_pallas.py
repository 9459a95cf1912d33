"""Pallas TPU kernels: fused nested-dissection sweep stages.

TPU-native heir of the reference's hand-tuned micro-kernels
(``src/matmul.c:31-574``, AVX2-unrolled 4x4/5x5/8x8 matmuls) applied to the
solver's bandwidth-bound stages. Two kernels:

1. :func:`schur_update_level_em` — the Schur updates of one tree level
   (``ndlqr_UpdateShurFactor``, nested_dissection.c:154-171, driven by
   solve.c:119-131) for ALL upper levels in one HBM pass per slab.
2. :func:`leaf_schur_level0_em` — level 0 fused with leaf construction
   (``ndlqr_SolveLeaf``, nested_dissection.c:10-105): the leaf factor values
   are synthesized in-registers from A/B/Q/R and each slab is written to HBM
   exactly once, already carrying the level-0 update — eliminating the
   separate leaf pass's full write+read round trip over every slab.

Shared design (element-major layout ``[n*n, N, B]``):

* Each block element is a dense ``[knots, batch]`` plane, so every FMA runs
  on full (8, 128) f32 tiles; the knot-major layout would waste 6/8
  sublanes per element slice.
* All upper levels update in ONE kernel invocation: the level-L multiplier
  blocks load to VMEM once per (knot, batch) tile and feed every upper
  level's update — XLA re-reads them per level.
* The separator write-back (``fsol`` into the lambda slab at sep+1 knots)
  and the calc_lambda mask (knots that are multiples of 2^L skip the lambda
  update, except knot 0 — nested_dissection.c:173-177) fuse into the same
  single write per output element.
* **Next-level inner products emitted directly**: when the knot tile covers
  whole next-level groups, the kernel computes and emits
  ``S = A_sep @ Fx[sep] + B_sep @ Fu[sep] - Fx[sep+1] - Fl[sep+1]``
  (``ndlqr_FactorInnerProduct``, nested_dissection.c:114-134) for every
  upper level — one compact ``[G2, nn, B]`` array per upper level instead
  of four separator extracts, so the products stage costs no slab re-reads
  and 4x less inter-stage traffic than the round-2 extract design.
* **Folded separator write-back**: the emitted ``S`` for the next level's
  own slab (its Sbar) is simultaneously written into that slab's sep+1
  rows, absorbing the next level's XLA write-back pass.
* In/out aliasing: each upper slab is updated in place.
* Stores are coarsened to whole ``[nn, tk, tb]`` blocks (round 2's
  row-granular extract stores dominated a ~10-minute Mosaic compile).

The tiny block matmul unrolls to VPU lane math; the solved separator blocks
``fsol`` broadcast over each group's rows (at most 4 groups per tile).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_broadcast(fs, e, gd, rpg, tb):
    """Broadcast group-major element ``fs[g, e]`` over each group's rows."""
    if gd == 1:
        return jnp.broadcast_to(fs[0, e][None, :], (rpg, tb))
    parts = [
        jnp.broadcast_to(fs[g, e][None, :], (rpg, tb)) for g in range(gd)
    ]
    return jnp.concatenate(parts, axis=0)


def _mm_planes(FL, fpl, p, n):
    """``FL @ f`` unrolled: p*n output planes of [tk, tb] FMAs.

    ``FL`` indexes planes (callable e -> [tk, tb]); ``fpl`` is the list of
    broadcast solved-separator planes.
    """
    outs = []
    for i_ in range(p):
        for k_ in range(n):
            acc = FL(i_ * n) * fpl[k_]
            for j in range(1, n):
                acc = acc + FL(i_ * n + j) * fpl[j * n + k_]
            outs.append(acc)
    return outs


def _emit_S(vl, vx, vu, aref, bref, n, m, gd2, span, dt):
    """Next-level inner products from the tile's updated planes.

    ``vl``/``vx`` are nn and ``vu`` mn lists of [tk, tb] planes. Separator
    rows for the next level sit at local row ``g2*2*span + span - 1``
    (ndlqr_FactorInnerProduct, nested_dissection.c:114-134). Returns a
    [gd2, nn, tb] array.
    """
    nn = n * n
    groups = []
    for g2 in range(gd2):
        r = g2 * 2 * span + span - 1
        rows = []
        for i_ in range(n):
            for k_ in range(n):
                acc = aref[g2, i_ * n] * vx[k_][r]
                for j in range(1, n):
                    acc = acc + aref[g2, i_ * n + j] * vx[j * n + k_][r]
                for j in range(m):
                    acc = acc + bref[g2, i_ * m + j] * vu[j * n + k_][r]
                acc = acc - vx[i_ * n + k_][r + 1] - vl[i_ * n + k_][r + 1]
                rows.append(acc)
        groups.append(jnp.stack(rows, axis=0))
    return jnp.stack(groups, axis=0).astype(dt)


def _fold_rows(planes, S, gd2, span, tk, knots):
    """Overwrite next-level sep+1 rows of ``planes`` with ``S`` values
    (the next level's separator write-back, ref solve.c:92-97 /
    nested_dissection.c:136-152 Sbar placement), folded into this store."""
    span2 = 2 * span
    mask = (knots & (span2 - 1)) == span  # local == absolute: tiles align
    nn = len(planes)
    tb = planes[0].shape[-1]
    rpg = span2
    out = []
    for e in range(nn):
        sp = _group_broadcast(S, e, gd2, rpg, tb)
        out.append(jnp.where(mask, sp, planes[e]))
    return out


def _update_kernel(
    *refs, n, m, level, tk, tb, span, U, gd, gd2, leaf_depth, N
):
    """Kernel body for both entry points (leaf_depth > 0 = leaf mode)."""
    nn, mn = n * n, m * n
    leaf = leaf_depth > 0
    emit = gd2 > 0
    i = pl.program_id(0)
    halfspan = 1 << level
    rpg = max(tk // gd, 1)

    knots = i * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
    # calc_lambda (nested_dissection.c:173-177): multiples of 2^level are
    # range starts and skip the lambda update, except knot 0.
    keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
    # Separator write positions: knot == sep+1 <=> knot % span == 2^level.
    sep = (knots & (span - 1)) == halfspan

    if leaf:
        # refs: A, B, qinv, rinv, S0, fsol*U, [Asep, Bsep]
        A_r, B_r, qi_r, ri_r, S0_r = refs[0:5]
        fss = refs[5 : 5 + U]
        k = 5 + U
    else:
        fll, flx, flu = refs[0:3]
        fls = refs[3 : 3 + U]
        fxs = refs[3 + U : 3 + 2 * U]
        fus = refs[3 + 2 * U : 3 + 3 * U]
        fss = refs[3 + 3 * U : 3 + 4 * U]
        k = 3 + 4 * U
    if emit:
        aref, bref = refs[k : k + 2]
        k += 2
    outs = refs[k:]
    if leaf:
        ol0, ox0, ou0 = outs[0:3]
        outs = outs[3:]
    ols, oxs, ous = outs[0:U], outs[U : 2 * U], outs[2 * U : 3 * U]
    oSs = outs[3 * U : 4 * U] if emit else None
    fdt = ol0.dtype if leaf else ols[0].dtype  # slab storage dtype

    if leaf:
        # Synthesize the leaf factor values (ndlqr_SolveLeaf,
        # nested_dissection.c:10-105) from the problem data in-registers.
        # level(k) = trailing zeros of k+1 (binary_tree.c:65-73), so the
        # per-level ownership masks are single AND/EQ tests per row.
        qip = [qi_r[e] for e in range(n)]
        rip = [ri_r[e] for e in range(m)]

        def leaf_level(L):
            own = jnp.logical_and(
                ((knots + 1) & ((2 << L) - 1)) == (1 << L),
                jnp.logical_and(knots >= 1, knots < N - 1),
            )
            prev = (knots & ((2 << L) - 1)) == (1 << L)
            ownu = jnp.logical_or(own, knots == 0) if L == 0 else own
            fx, fu = [], []
            for i_ in range(n):
                for j_ in range(n):
                    # Qinv At: At[i,j] = A[j,i] -> plane j*n+i, row-scaled.
                    v = jnp.where(own, A_r[j_ * n + i_] * qip[i_], 0.0)
                    if i_ == j_:
                        v = v - jnp.where(prev, qip[i_], 0.0)
                    fx.append(v)
            for i_ in range(m):
                for j_ in range(n):
                    # Rinv Bt: Bt[i,j] = B[j,i] -> plane j*m+i.
                    fu.append(
                        jnp.where(ownu, B_r[j_ * m + i_] * rip[i_], 0.0)
                    )
            return fx, fu

        leaf_fx = [None] * leaf_depth
        leaf_fu = [None] * leaf_depth
        for L in range(leaf_depth):
            leaf_fx[L], leaf_fu[L] = leaf_level(L)
        knot0 = knots == 0
        leaf_fl0 = [
            jnp.where(knot0, -A_r[j_ * n + i_], 0.0)
            for i_ in range(n)
            for j_ in range(n)
        ]
        # Level-0 slab outputs: leaf values + own Sbar write-back at sep+1
        # (odd) rows (ref solve.c:92-97 placement; S0 computed XLA-side).
        gd0 = tk // span  # span == 2 in leaf mode
        ol0_planes = []
        for e in range(nn):
            sp = _group_broadcast(S0_r, e, gd0, span, tb)
            ol0_planes.append(jnp.where(sep, sp, leaf_fl0[e]))
        ol0[:] = jnp.stack(ol0_planes, axis=0).astype(fdt)
        ox0[:] = jnp.stack(leaf_fx[0], axis=0).astype(fdt)
        ou0[:] = jnp.stack(leaf_fu[0], axis=0).astype(fdt)

        FLl = lambda e: leaf_fl0[e]
        FLx = lambda e: leaf_fx[0][e]
        FLu = lambda e: leaf_fu[0][e]
    else:
        FLl = lambda e: fll[e]
        FLx = lambda e: flx[e]
        FLu = lambda e: flu[e]

    for u in range(U):
        fs = fss[u]  # [gd, nn, tb] block of the group-major [G, nn, B] array
        fpl = [_group_broadcast(fs, e, gd, rpg, tb) for e in range(nn)]

        ul = _mm_planes(FLl, fpl, n, n)
        ux = _mm_planes(FLx, fpl, n, n)
        uu = _mm_planes(FLu, fpl, m, n)
        if leaf:
            in_l = lambda e: 0.0  # upper lambda slabs start at zero
            in_x = lambda e: leaf_fx[u + 1][e]
            in_u = lambda e: leaf_fu[u + 1][e]
        else:
            in_l = lambda e, _r=fls[u]: _r[e]
            in_x = lambda e, _r=fxs[u]: _r[e]
            in_u = lambda e, _r=fus[u]: _r[e]
        vl = [
            jnp.where(sep, fpl[e], in_l(e) - jnp.where(keep, ul[e], 0.0))
            for e in range(nn)
        ]
        vx = [in_x(e) - ux[e] for e in range(nn)]
        vu = [in_u(e) - uu[e] for e in range(mn)]
        if emit:
            # Inner products for the NEXT level, from the pre-fold values.
            S = _emit_S(vl, vx, vu, aref, bref, n, m, gd2, span, oSs[u].dtype)
            oSs[u][:] = S
            if u == 0:
                # u == 0 is the next level's own slab: fold its separator
                # write-back (Sbar = S) into this store.
                vl = _fold_rows(vl, S, gd2, span, tk, knots)
        ols[u][:] = jnp.stack(vl, axis=0).astype(fdt)
        oxs[u][:] = jnp.stack(vx, axis=0).astype(fdt)
        ous[u][:] = jnp.stack(vu, axis=0).astype(fdt)


def _mv_planes(FL, fpl, p, n):
    """``FL @ z`` unrolled mat-vec: p output planes of [tk, tb] FMAs."""
    outs = []
    for i_ in range(p):
        acc = FL(i_ * n) * fpl[0]
        for j in range(1, n):
            acc = acc + FL(i_ * n + j) * fpl[j]
        outs.append(acc)
    return outs


def _rhs_kernel(*refs, n, m, level, tk, tb, span, gd):
    """RHS-sweep update for one level (ref solve.c:171-181): the z vectors
    absorb ``F @ zbar`` with the calc_lambda mask and the solved separator
    write-back, one slab read per level."""
    i = pl.program_id(0)
    halfspan = 1 << level
    rpg = max(tk // gd, 1)
    fl, fx, fu, zy, zx, zu, zb = refs[0:7]
    oy, ox, ou = refs[7:10]

    knots = i * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
    keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
    sep = (knots & (span - 1)) == halfspan

    fpl = [_group_broadcast(zb, e, gd, rpg, tb) for e in range(n)]
    uy = _mv_planes(lambda e: fl[e], fpl, n, n)
    ux = _mv_planes(lambda e: fx[e], fpl, n, n)
    uu = _mv_planes(lambda e: fu[e], fpl, m, n)
    vy = [
        jnp.where(sep, fpl[e], zy[e] - jnp.where(keep, uy[e], 0.0))
        for e in range(n)
    ]
    vx = [zx[e] - ux[e] for e in range(n)]
    vu = [zu[e] - uu[e] for e in range(m)]
    oy[:] = jnp.stack(vy, axis=0)
    ox[:] = jnp.stack(vx, axis=0)
    ou[:] = jnp.stack(vu, axis=0)


@functools.partial(
    jax.jit, static_argnames=("level", "n", "m", "interpret", "tb")
)
def rhs_update_level_em(
    Fl: jax.Array,    # [nn, N, B] factor slab of this level (storage dtype)
    Fx: jax.Array,    # [nn, N, B]
    Fu: jax.Array,    # [mn, N, B]
    zy: jax.Array,    # [n, N, B] RHS planes (solve dtype)
    zx: jax.Array,    # [n, N, B]
    zu: jax.Array,    # [m, N, B]
    zbar: jax.Array,  # [G, n, B] solved separator RHS, group-major
    *,
    level: int,
    n: int,
    m: int,
    interpret: bool = False,
    tb: int = 128,
):
    """One level of the RHS sweep's slab application (ref solve.c:137-182)
    as a single HBM pass over the level's factor slab.

    The separator solve itself (znew + cached-Cholesky solve producing
    ``zbar``) stays in XLA — it touches only compact [n, G, B] data.
    Returns updated ``(zy, zx, zu)`` with the z inputs donated.
    """
    nn, N, B = Fl.shape
    mn = m * n
    span, tk, gd, _, tb = _tiles(level, N, B, Fl.dtype, tb)

    grid = (N // tk, B // tb)
    spec = lambda e: pl.BlockSpec((e, tk, tb), lambda i, j: (0, i, j))
    zb_spec = pl.BlockSpec(
        (gd, n, tb), lambda i, j: ((i * tk) // (span * gd), 0, j)
    )
    kernel = functools.partial(
        _rhs_kernel, n=n, m=m, level=level, tk=tk, tb=tb, span=span, gd=gd
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec(nn), spec(nn), spec(mn), spec(n), spec(n), spec(m), zb_spec
        ],
        out_specs=[spec(n), spec(n), spec(m)],
        out_shape=[
            jax.ShapeDtypeStruct(zy.shape, zy.dtype),
            jax.ShapeDtypeStruct(zx.shape, zx.dtype),
            jax.ShapeDtypeStruct(zu.shape, zu.dtype),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(Fl, Fx, Fu, zy, zx, zu, zbar)


def _tiles(
    level: int, N: int, B: int, dtype, tb: int
) -> Tuple[int, int, int, int, int]:
    """Knot/batch tiling + group counts for one level:
    ``(span, tk, gd, gd2, tb)``."""
    span = 1 << (level + 1)
    min_tk = 16 if dtype == jnp.bfloat16 else 8
    tk = min(max(2 * span, min_tk), 2 * min_tk, N)
    gd = max(tk // span, 1)
    gd2 = tk // (2 * span) if 2 * span <= tk and N >= 2 * span else 0
    tb = min(tb, B)
    if N % tk or B % tb:
        raise ValueError(f"N={N} B={B} not divisible by tiles ({tk},{tb})")
    return span, tk, gd, gd2, tb


@functools.partial(
    jax.jit, static_argnames=("level", "n", "m", "interpret", "tb")
)
def schur_update_level_em(
    FLl: jax.Array,            # [nn, N, B] level-L lambda multiplier slab
    FLx: jax.Array,            # [nn, N, B]
    FLu: jax.Array,            # [mn, N, B]
    Fls: Sequence[jax.Array],  # U upper-level slabs [nn, N, B]
    Fxs: Sequence[jax.Array],  # U x [nn, N, B]
    Fus: Sequence[jax.Array],  # U x [mn, N, B]
    fsol: Sequence[jax.Array],  # U solved separator blocks, GROUP-major
                                # [G, nn, B] (groups lead: the TPU block
                                # constraint pins the last two dims to
                                # (8k, 128)-aligned or full-size)
    Asep: Optional[jax.Array] = None,  # [G2, nn, B] A at next-level seps
    Bsep: Optional[jax.Array] = None,  # [G2, nm, B] B at next-level seps
    *,
    level: int,
    n: int,
    m: int,
    interpret: bool = False,
    tb: int = 128,
):
    """Apply the level-``level`` Schur updates + separator write-back to
    every upper-level slab in one HBM pass per slab.

    Returns ``(Fls, Fxs, Fus, S_next)`` with inputs donated. When
    ``Asep``/``Bsep`` are given and the knot tile covers whole next-level
    groups, ``S_next`` is the per-upper-level list of next-level inner
    products ``[G2, nn, B]`` (``S_next[0]`` is the next level's Sbar, whose
    separator write-back is already folded into that slab); otherwise
    ``None`` (the caller computes products from the slabs)."""
    nn, N, B = FLl.shape
    mn = m * n
    U = len(Fls)
    span, tk, gd, gd2, tb = _tiles(level, N, B, FLl.dtype, tb)
    emit = gd2 > 0 and Asep is not None
    if not emit:
        gd2 = 0

    grid = (N // tk, B // tb)
    slab_spec = lambda e: pl.BlockSpec((e, tk, tb), lambda i, j: (0, i, j))
    f_spec = pl.BlockSpec(
        (gd, nn, tb), lambda i, j: ((i * tk) // (span * gd), 0, j)
    )
    ex_spec = lambda e: pl.BlockSpec((gd2, e, tb), lambda i, j: (i, 0, j))
    in_specs = (
        [slab_spec(nn), slab_spec(nn), slab_spec(mn)]
        + [slab_spec(nn)] * U
        + [slab_spec(nn)] * U
        + [slab_spec(mn)] * U
        + [f_spec] * U
    )
    args = [FLl, FLx, FLu, *Fls, *Fxs, *Fus, *fsol]
    if emit:
        in_specs += [ex_spec(nn), ex_spec(mn)]
        args += [Asep, Bsep]
    out_specs = [slab_spec(nn)] * U + [slab_spec(nn)] * U + [slab_spec(mn)] * U
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fls]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fxs]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fus]
    )
    if emit:
        G2 = N // (2 * span)
        dt = fsol[0].dtype  # separator math precision (f32 even for bf16)
        out_specs += [ex_spec(nn)] * U
        out_shape += [jax.ShapeDtypeStruct((G2, nn, B), dt)] * U
    aliases = {}
    for u in range(U):
        aliases[3 + u] = u               # Fl_u -> ol_u
        aliases[3 + U + u] = U + u       # Fx_u -> ox_u
        aliases[3 + 2 * U + u] = 2 * U + u
    kernel = functools.partial(
        _update_kernel, n=n, m=m, level=level, tk=tk, tb=tb, span=span, U=U,
        gd=gd, gd2=gd2, leaf_depth=0, N=N,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        # The U=5 (level-2, tk=16) configuration needs ~17MB of pipelined
        # blocks — just over the 16MB default scoped budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(*args)
    slabs = tuple(outs[:U]), tuple(outs[U : 2 * U]), tuple(outs[2 * U : 3 * U])
    if not emit:
        return slabs + (None,)
    return slabs + (list(outs[3 * U : 4 * U]),)


def _pair_kernel(
    *refs, n, m, level, tk, tb, span, U, gd, gd2b, gd3, N
):
    """Kernel body for :func:`schur_update_pair_em`: apply levels ``level``
    AND ``level + 1`` to every upper slab in ONE read+write pass.

    The second level's multiplier planes are the first update's results for
    ``u = level + 1``, held in registers — the level-(L+1) slab pass of the
    single-level flow (its multiplier re-read plus a full r/w of every
    upper slab) never touches HBM. ``span`` is level L's group span;
    ``gd``/``gd2b``/``gd3`` are the fsol1/fsol2/emission group counts per
    tile.
    """
    nn, mn = n * n, m * n
    U2 = U - 1
    emit = gd3 > 0
    i = pl.program_id(0)
    halfspan = 1 << level
    span2 = 2 * span
    rpg1 = max(tk // gd, 1)
    rpg2 = max(tk // gd2b, 1)

    knots = i * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
    keep1 = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
    sep1 = (knots & (span - 1)) == halfspan
    # Level L+1 masks (nested_dissection.c:173-177 at the next level).
    keep2 = jnp.logical_or((knots & (span - 1)) != 0, knots == 0)
    sep2 = (knots & (span2 - 1)) == span

    fll, flx, flu = refs[0:3]
    fls = refs[3 : 3 + U]
    fxs = refs[3 + U : 3 + 2 * U]
    fus = refs[3 + 2 * U : 3 + 3 * U]
    f1s = refs[3 + 3 * U : 3 + 4 * U]
    sbar2 = refs[3 + 4 * U]
    f2s = refs[4 + 4 * U : 4 + 4 * U + U2]
    k = 4 + 4 * U + U2
    if emit:
        aref, bref = refs[k : k + 2]
        k += 2
    outs = refs[k:]
    ols, oxs, ous = outs[0:U], outs[U : 2 * U], outs[2 * U : 3 * U]
    oSs = outs[3 * U : 3 * U + U2] if emit else None
    fdt = ols[0].dtype

    FLl = lambda e: fll[e]
    FLx = lambda e: flx[e]
    FLu = lambda e: flu[e]

    for uu in range(U):
        # ---- update 1 (level L) ----
        fs = f1s[uu]
        fpl1 = [_group_broadcast(fs, e, gd, rpg1, tb) for e in range(nn)]
        ul = _mm_planes(FLl, fpl1, n, n)
        ux = _mm_planes(FLx, fpl1, n, n)
        uu_ = _mm_planes(FLu, fpl1, m, n)
        vl = [
            jnp.where(sep1, fpl1[e], fls[uu][e] - jnp.where(keep1, ul[e], 0.0))
            for e in range(nn)
        ]
        vx = [fxs[uu][e] - ux[e] for e in range(nn)]
        vu = [fus[uu][e] - uu_[e] for e in range(mn)]
        if uu == 0:
            # u == L+1: fold its Sbar (pre-pass S2[0]) into the lambda slab
            # at sep2+1 rows (solve.c:92-97 placement), then these planes
            # ARE the level-(L+1) multiplier — re-read below from the
            # already-written output block rather than held live across
            # every u iteration (holding ~90 extra planes in registers
            # spilled and halved the kernel's HBM stream: measured
            # 313 GB/s vs the single kernel's ~700).
            vl = _fold_rows(vl, sbar2, gd2b, span, tk, knots)
        else:
            # ---- update 2 (level L+1) ----
            fs2 = f2s[uu - 1]
            fpl2 = [
                _group_broadcast(fs2, e, gd2b, rpg2, tb) for e in range(nn)
            ]
            u2l = _mm_planes(lambda e: ols[0][e], fpl2, n, n)
            u2x = _mm_planes(lambda e: oxs[0][e], fpl2, n, n)
            u2u = _mm_planes(lambda e: ous[0][e], fpl2, m, n)
            vl = [
                jnp.where(
                    sep2, fpl2[e], vl[e] - jnp.where(keep2, u2l[e], 0.0)
                )
                for e in range(nn)
            ]
            vx = [vx[e] - u2x[e] for e in range(nn)]
            vu = [vu[e] - u2u[e] for e in range(mn)]
            if emit:
                S = _emit_S(
                    vl, vx, vu, aref, bref, n, m, gd3, span2, oSs[uu - 1].dtype
                )
                oSs[uu - 1][:] = S
                if uu == 1:
                    # u == L+2: fold its own Sbar into this store.
                    vl = _fold_rows(vl, S, gd3, span2, tk, knots)
        ols[uu][:] = jnp.stack(vl, axis=0).astype(fdt)
        oxs[uu][:] = jnp.stack(vx, axis=0).astype(fdt)
        ous[uu][:] = jnp.stack(vu, axis=0).astype(fdt)


def _tiles_pair(
    level: int, N: int, B: int, dtype, tb: int, slab_elems: int, U: int
) -> Tuple[int, int, int, int, int, int]:
    """Tiling for the paired kernel: ``(span, tk, gd1, gd2b, gd3, tb)``.

    ``tk`` must cover whole level-(L+1) groups (``2 * span``); emission of
    the level-(L+2) products additionally needs ``tk`` to cover whole
    L+2 groups (``4 * span``), taken when the pipelined slab blocks
    (``slab_elems`` element planes per slab trio, ``U + 1`` trios, double
    buffered) fit the VMEM budget.
    """
    span = 1 << (level + 1)
    span2 = 2 * span
    min_tk = 16 if dtype == jnp.bfloat16 else 8
    tb = min(tb, B)
    itemsize = jnp.dtype(dtype).itemsize
    est = lambda tk: (1 + U) * slab_elems * tk * tb * itemsize * 2
    tk_emit = max(2 * span2, min_tk)
    tk_plain = max(span2, min_tk)
    if tk_emit <= N and est(tk_emit) <= 60 * 1024 * 1024:
        tk = tk_emit
        gd3 = tk // span2 // 2
    else:
        tk = min(tk_plain, N)
        gd3 = 0
    if N % tk or B % tb:
        raise ValueError(f"N={N} B={B} not divisible by pair tiles ({tk},{tb})")
    return span, tk, max(tk // span, 1), max(tk // span2, 1), gd3, tb


@functools.partial(
    jax.jit, static_argnames=("level", "n", "m", "interpret", "tb")
)
def schur_update_pair_em(
    FLl: jax.Array,            # [nn, N, B] level-L lambda multiplier slab
    FLx: jax.Array,
    FLu: jax.Array,            # [mn, N, B]
    Fls: Sequence[jax.Array],  # U upper-level slabs (u = L+1..depth-1)
    Fxs: Sequence[jax.Array],
    Fus: Sequence[jax.Array],
    fsol1: Sequence[jax.Array],  # U solved level-L separators [G1, nn, B]
    Sbar2: jax.Array,            # [G2, nn, B] level-(L+1) Sbar (pre-pass)
    fsol2: Sequence[jax.Array],  # U-1 solved level-(L+1) separators [G2,nn,B]
    Asep3: Optional[jax.Array] = None,  # [G3, nn, B] A at L+2 separators
    Bsep3: Optional[jax.Array] = None,
    *,
    level: int,
    n: int,
    m: int,
    interpret: bool = False,
    tb: int = 128,
):
    """Apply the Schur updates of levels ``level`` and ``level + 1`` to every
    upper slab in ONE HBM pass per slab (plus both separator write-backs and
    the level-(L+2) product emission).

    The mid-pair products ``S_{L+1}`` come from a compact XLA pre-pass
    (rslqr_em._pair_prepass) — only separator rows are touched there, so the
    full level-(L+1) slab pass of the single-level flow (~(1 + 2*(U-1))
    slab-trio reads/writes) is eliminated. Ref solve.c:68-134 (two level
    iterations fused).
    """
    nn, N, B = FLl.shape
    mn = m * n
    U = len(Fls)
    span, tk, gd, gd2b, gd3, tb = _tiles_pair(
        level, N, B, FLl.dtype, tb, 2 * nn + mn, U
    )
    emit = gd3 > 0 and Asep3 is not None and U >= 2
    if not emit:
        gd3 = 0
    span2 = 2 * span

    grid = (N // tk, B // tb)
    slab_spec = lambda e: pl.BlockSpec((e, tk, tb), lambda i, j: (0, i, j))
    f1_spec = pl.BlockSpec(
        (gd, nn, tb), lambda i, j: ((i * tk) // (span * gd), 0, j)
    )
    f2_spec = pl.BlockSpec(
        (gd2b, nn, tb), lambda i, j: ((i * tk) // (span2 * gd2b), 0, j)
    )
    ex_spec = lambda e: pl.BlockSpec((gd3, e, tb), lambda i, j: (i, 0, j))
    in_specs = (
        [slab_spec(nn), slab_spec(nn), slab_spec(mn)]
        + [slab_spec(nn)] * U
        + [slab_spec(nn)] * U
        + [slab_spec(mn)] * U
        + [f1_spec] * U
        + [f2_spec]
        + [f2_spec] * (U - 1)
    )
    args = [FLl, FLx, FLu, *Fls, *Fxs, *Fus, *fsol1, Sbar2, *fsol2]
    if emit:
        in_specs += [ex_spec(nn), ex_spec(mn)]
        args += [Asep3, Bsep3]
    out_specs = [slab_spec(nn)] * U + [slab_spec(nn)] * U + [slab_spec(mn)] * U
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fls]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fxs]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fus]
    )
    if emit:
        G3 = N // (2 * span2)
        dt = fsol1[0].dtype
        out_specs += [ex_spec(nn)] * (U - 1)
        out_shape += [jax.ShapeDtypeStruct((G3, nn, B), dt)] * (U - 1)
    aliases = {}
    for u in range(U):
        aliases[3 + u] = u
        aliases[3 + U + u] = U + u
        aliases[3 + 2 * U + u] = 2 * U + u
    kernel = functools.partial(
        _pair_kernel, n=n, m=m, level=level, tk=tk, tb=tb, span=span, U=U,
        gd=gd, gd2b=gd2b, gd3=gd3, N=N,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*args)
    slabs = tuple(outs[:U]), tuple(outs[U : 2 * U]), tuple(outs[2 * U : 3 * U])
    if not emit:
        return slabs + (None,)
    return slabs + (list(outs[3 * U : 4 * U - 1]),)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "n", "m", "interpret", "tb", "factor_dtype"),
)
def leaf_schur_level0_em(
    A: jax.Array,      # [nn, N, B] element-major dynamics (flattened blocks)
    B: jax.Array,      # [nm, N, B]
    qinv: jax.Array,   # [n, N, B] 1/Qdiag
    rinv: jax.Array,   # [m, N, B] 1/Rdiag
    S0: jax.Array,     # [G0, nn, B] level-0 Sbar (for slab-0's write-back)
    fsol: Sequence[jax.Array],  # U = depth-1 solved level-0 separators
    Asep: jax.Array,   # [G1, nn, B] A at level-1 separator knots
    Bsep: jax.Array,   # [G1, nm, B]
    *,
    depth: int,
    n: int,
    m: int,
    interpret: bool = False,
    tb: int = 128,
    factor_dtype: str = "",
):
    """Fused leaf construction + level-0 Schur update.

    Synthesizes every level's leaf factor values in-registers from the
    problem data (ndlqr_SolveLeaf, nested_dissection.c:10-105 — the masks
    come from the closed-form tree index math, binary_tree.c:65-73), applies
    the level-0 updates, and writes each factor slab to HBM exactly once in
    its post-level-0 state. Emits the level-1 inner products (with the
    level-1 Sbar write-back folded, as in :func:`schur_update_level_em`).

    Returns ``(Fls, Fxs, Fus, S_next)`` — per-level tuples of length
    ``depth`` and the level-1 products list.
    """
    nn, N, Bb = A.shape
    mn = m * n
    U = depth - 1
    level = 0
    fdt = jnp.dtype(factor_dtype) if factor_dtype else A.dtype
    span, tk, gd, gd2, tb = _tiles(level, N, Bb, fdt, tb)
    assert gd2 > 0, (N, tk)

    grid = (N // tk, Bb // tb)
    slab_spec = lambda e: pl.BlockSpec((e, tk, tb), lambda i, j: (0, i, j))
    f_spec = pl.BlockSpec(
        (gd, nn, tb), lambda i, j: ((i * tk) // (span * gd), 0, j)
    )
    ex_spec = lambda e: pl.BlockSpec((gd2, e, tb), lambda i, j: (i, 0, j))
    in_specs = (
        [slab_spec(nn), slab_spec(mn), slab_spec(n), slab_spec(m), f_spec]
        + [f_spec] * U
        + [ex_spec(nn), ex_spec(mn)]
    )
    out_specs = (
        [slab_spec(nn), slab_spec(nn), slab_spec(mn)]
        + [slab_spec(nn)] * U
        + [slab_spec(nn)] * U
        + [slab_spec(mn)] * U
        + [ex_spec(nn)] * U
    )
    dt = fsol[0].dtype if U else S0.dtype
    G2 = N // (2 * span)
    out_shape = (
        [
            jax.ShapeDtypeStruct((nn, N, Bb), fdt),
            jax.ShapeDtypeStruct((nn, N, Bb), fdt),
            jax.ShapeDtypeStruct((mn, N, Bb), fdt),
        ]
        + [jax.ShapeDtypeStruct((nn, N, Bb), fdt)] * U
        + [jax.ShapeDtypeStruct((nn, N, Bb), fdt)] * U
        + [jax.ShapeDtypeStruct((mn, N, Bb), fdt)] * U
        + [jax.ShapeDtypeStruct((G2, nn, Bb), dt)] * U
    )
    kernel = functools.partial(
        _update_kernel, n=n, m=m, level=level, tk=tk, tb=tb, span=span, U=U,
        gd=gd, gd2=gd2, leaf_depth=depth, N=N,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(A, B, qinv, rinv, S0, *fsol, Asep, Bsep)
    ol0, ox0, ou0 = outs[0:3]
    rest = outs[3:]
    Fls = (ol0,) + tuple(rest[:U])
    Fxs = (ox0,) + tuple(rest[U : 2 * U])
    Fus = (ou0,) + tuple(rest[2 * U : 3 * U])
    return Fls, Fxs, Fus, list(rest[3 * U : 4 * U])

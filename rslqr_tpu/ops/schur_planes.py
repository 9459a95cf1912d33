"""Pallas TPU kernels: small-block nested-dissection sweep on flat planes.

Flat-plane re-design of :mod:`rslqr_tpu.ops.schur_pallas` for the regime
where the (knot x batch) plane flattens onto whole (8, 128) f32 tiles per
knot (``B % 1024 == 0``). The three fused stages are the same as there —
fused leaf + level-0, multi-upper-level Schur update, RHS sweep level (ref
``src/solve.c:38-190``, ``src/nested_dissection.c:10-177``) — but every
slab is addressed as ``[p*q, N*B/128, 128]`` element planes:

* Each knot owns ``rb = B / 128`` whole sublane rows, so the per-group
  solved-separator broadcast is a whole-vreg ``reshape + broadcast_to``
  (one bulk op per element plane) instead of the row-granular
  extract + concat machinery that left the [nn, N, B] kernels
  compute/shuffle-bound at ~320 GB/s / 0.44 TF/s in deep-U configs
  (probes/probe_pairkernel.py).
* Separator-row reads for the next level's inner products are aligned
  ``rb``-row slices of the in-register planes, and the emitted products
  store as aligned row-slices of a compact output — no per-row stacks.
* calc_lambda / separator masks come from the flat-position -> knot-id
  recovery proven in :mod:`rslqr_tpu.ops.planes_pallas` (iota >> log2(B)).
* Tiles are ``t1 = kpt * rb`` rows (multiple knots per grid step), so
  every elementwise op covers ``t1 / 8`` vregs — the op-issue
  amortization the mid-block planes suite runs at 2.1-3.3 TF/s with.

The multi-level traffic structure is preserved: ONE kernel invocation per
tree level updates ALL upper slabs, reading the level's multiplier trio
once per tile; each upper slab streams HBM exactly once (aliased in/out).

**Measured outcome (round 5, negative result — kept as a tested
experiment, off by default via ``SolveOptions.flat_planes``):** 625 GB/s
at L=1/U=6 vs 745 GB/s for the [nn, N, B] suite, 17.3 vs 13.6 ms
end-to-end (probes/probe_flatkernel.py, probe_flat_ab.py). The round-4
"shuffle-bound 0.44 TF/s" diagnosis this layout was built to fix was a
measurement artifact: the probe's chain carried only the multiplier slab,
so XLA copied every donated upper slab each iteration and the apparent
bandwidth halved. With slab-carrying chains the original kernels measure
~91% of the 819 GB/s HBM roofline — there was no shuffle bound to
eliminate, and the larger flat tiles (t1 = 64 rows) trade away pipelining
headroom instead.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def _kpt_for(level: int, N: int) -> int:
    """Knots per tile: cover whole next-level groups (2 * 2^{level+1}) for
    product emission at the shallow levels, capped at 8 knots (VMEM)."""
    span = 1 << (level + 1)
    kpt = min(max(2 * span, 4), 8, N)
    return kpt


def _knot_masks(i0, t1, t2, logb, level):
    """(t1, t2) keep / sep masks from flat plane positions (planes_pallas
    idiom): knot = flat_index >> log2(B)."""
    flat = (
        (i0 * t1 + jax.lax.broadcasted_iota(jnp.int32, (t1, t2), 0)) * t2
        + jax.lax.broadcasted_iota(jnp.int32, (t1, t2), 1)
    )
    knots = flat >> logb
    halfspan = 1 << level
    span = 2 << level
    keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
    sep = (knots & (span - 1)) == halfspan
    return knots, keep, sep


def _bcast_groups(fsb, gd, grows, rb):
    """Broadcast ``gd`` group chunks of ``rb`` rows each over their group's
    ``grows`` rows within the tile: ``[gd*rb, t2] -> [gd*grows, t2]``
    (whole-vreg reshape/broadcast when rb % 8 == 0). ``grows`` is
    ``t1 // gd`` — the full group span when the tile covers whole groups,
    or the whole tile when the tile sits inside one group."""
    t2 = fsb.shape[-1]
    rep = grows // rb
    if rep == 1:
        return fsb
    g3 = fsb.reshape(gd, 1, rb, t2)
    return jnp.broadcast_to(g3, (gd, rep, rb, t2)).reshape(
        gd * grows, t2
    )


def _mm_flat(FL, fpl, p, n):
    """``FL @ f`` unrolled: p*n output planes of [t1, t2] FMAs."""
    outs = []
    for i_ in range(p):
        for k_ in range(n):
            acc = FL(i_ * n) * fpl[k_]
            for j in range(1, n):
                acc = acc + FL(i_ * n + j) * fpl[j * n + k_]
            outs.append(acc)
    return outs


def _emit_S_flat(vl, vx, vu, aref, bref, n, m, gd2, span, rb, oS, dt):
    """Next-level inner products from the tile's updated planes, stored as
    aligned rb-row slices of the compact [nn, gd2*rb, t2] output block.

    S[g2] = A_sep @ Fx[sep] + B_sep @ Fu[sep] - Fx[sep+1] - Fl[sep+1]
    (ndlqr_FactorInnerProduct, nested_dissection.c:114-134), where sep is
    local knot g2*2*span + span - 1.
    """
    nn = n * n
    for g2 in range(gd2):
        r = (g2 * 2 * span + span - 1) * rb
        gs = slice(g2 * rb, (g2 + 1) * rb)
        xs = [vx[e][r : r + rb] for e in range(nn)]
        us = [vu[e][r : r + rb] for e in range(m * n)]
        for i_ in range(n):
            for k_ in range(n):
                acc = aref[i_ * n, gs] * xs[k_]
                for j in range(1, n):
                    acc = acc + aref[i_ * n + j, gs] * xs[j * n + k_]
                for j in range(m):
                    acc = acc + bref[i_ * m + j, gs] * us[j * n + k_]
                e = i_ * n + k_
                acc = acc - vx[e][r + rb : r + 2 * rb]
                acc = acc - vl[e][r + rb : r + 2 * rb]
                oS[e, gs] = acc.astype(dt)


def _fold_S_rows(oref, oS, e, gd2, span, rb):
    """Overwrite the next level's sep+1 rows of output plane ``e`` with the
    emitted S values (the next level's Sbar write-back, ref solve.c:92-97),
    as aligned slice stores after the full-plane store."""
    for g2 in range(gd2):
        row = (g2 * 2 * span + span) * rb
        oref[e, row : row + rb] = oS[e, g2 * rb : (g2 + 1) * rb]


def _update_kernel_flat(
    *refs, n, m, level, t1, t2, rb, U, gd, gd2, leaf_depth, N, logb
):
    """Kernel body shared by the leaf and update entry points."""
    nn, mn = n * n, m * n
    leaf = leaf_depth > 0
    emit = gd2 > 0
    i0 = pl.program_id(0)
    span = 2 << level          # knots per group

    knots, keep, sep = _knot_masks(i0, t1, t2, logb, level)

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
    fdt = ol0.dtype if leaf else ols[0].dtype

    if leaf:
        # Synthesize the leaf factor values in-registers (ndlqr_SolveLeaf,
        # nested_dissection.c:10-105; level(k) = trailing zeros of k+1,
        # binary_tree.c:65-73 -> single AND/EQ masks).
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
                    v = jnp.where(own, A_r[j_ * n + i_] * qip[i_], 0.0)
                    if i_ == j_:
                        v = v - jnp.where(prev, qip[i_], 0.0)
                    fx.append(v)
            for i_ in range(m):
                for j_ in range(n):
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
        # Level-0 slab: leaf values with this level's own Sbar write-back
        # (S0) at sep rows.
        gd0 = t1 // (2 * rb)  # level-0 groups per tile (span = 2)
        for e in range(nn):
            sp = _bcast_groups(S0_r[e], gd0, 2 * rb, rb)
            ol0[e] = jnp.where(sep, sp, leaf_fl0[e]).astype(fdt)
        for e in range(nn):
            ox0[e] = leaf_fx[0][e].astype(fdt)
        for e in range(mn):
            ou0[e] = leaf_fu[0][e].astype(fdt)

        FLl = lambda e: leaf_fl0[e]
        FLx = lambda e: leaf_fx[0][e]
        FLu = lambda e: leaf_fu[0][e]
    else:
        FLl = lambda e: fll[e]
        FLx = lambda e: flx[e]
        FLu = lambda e: flu[e]

    for u in range(U):
        fs = fss[u]  # block [nn, gd*rb, t2] of the compact [nn, G*rb, P2]
        fpl = [_bcast_groups(fs[e], gd, t1 // gd, rb) for e in range(nn)]

        ul = _mm_flat(FLl, fpl, n, n)
        ux = _mm_flat(FLx, fpl, n, n)
        uu = _mm_flat(FLu, fpl, m, n)
        if leaf:
            in_l = lambda e: 0.0
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
        for e in range(nn):
            ols[u][e] = vl[e].astype(fdt)
        for e in range(nn):
            oxs[u][e] = vx[e].astype(fdt)
        for e in range(mn):
            ous[u][e] = vu[e].astype(fdt)
        if emit:
            _emit_S_flat(
                vl, vx, vu, aref, bref, n, m, gd2, span, rb, oSs[u],
                oSs[u].dtype,
            )
            if u == 0:
                # u == 0 is the next level's own slab: its separator
                # write-back (Sbar = S) lands as slice overwrites on the
                # already-stored planes.
                for e in range(nn):
                    _fold_S_rows(ols[u], oSs[u], e, gd2, span, rb)


def _mv_flat(FL, fpl, p, n):
    outs = []
    for i_ in range(p):
        acc = FL(i_ * n) * fpl[0]
        for j in range(1, n):
            acc = acc + FL(i_ * n + j) * fpl[j]
        outs.append(acc)
    return outs


def _rhs_kernel_flat(*refs, n, m, level, t1, t2, rb, gd, logb):
    """RHS-sweep level update (ref solve.c:171-181) on flat planes."""
    i0 = pl.program_id(0)
    fl, fx, fu, zy, zx, zu, zb = refs[0:7]
    oy, ox, ou = refs[7:10]

    _, keep, sep = _knot_masks(i0, t1, t2, logb, level)

    fpl = [_bcast_groups(zb[e], gd, t1 // gd, rb) for e in range(n)]
    uy = _mv_flat(lambda e: fl[e], fpl, n, n)
    ux = _mv_flat(lambda e: fx[e], fpl, n, n)
    uu = _mv_flat(lambda e: fu[e], fpl, m, n)
    for e in range(n):
        oy[e] = jnp.where(sep, fpl[e], zy[e] - jnp.where(keep, uy[e], 0.0))
    for e in range(n):
        ox[e] = zx[e] - ux[e]
    for e in range(m):
        ou[e] = zu[e] - uu[e]


def _flat_geometry(level: int, N: int, B: int):
    """Tile geometry: ``(rb, kpt, t1, span, gd, gd2)``. Requires
    ``B % 1024 == 0`` so each knot owns whole (8, 128) vregs."""
    rb = B // 128
    span = 1 << (level + 1)
    kpt = _kpt_for(level, N)
    t1 = kpt * rb
    gd = max(kpt // span, 1)
    gd2 = kpt // (2 * span) if 2 * span <= kpt and N >= 2 * span else 0
    return rb, kpt, t1, span, gd, gd2


def flat_ok(N: int, B: int, dtype) -> bool:
    """Whether the flat-plane kernels apply: f32 storage, whole-vreg knots,
    and at least one tile of knots."""
    return (
        dtype == jnp.float32
        and B % 1024 == 0
        and N >= 4
        and N % _kpt_for(0, N) == 0
    )


def _fs_spec(nn, gd, rb, span, kpt):
    """BlockSpec for a compact group-major-rows operand [nn, G*rb, P2]:
    gd group chunks per tile, group index derived from the tile index."""
    return pl.BlockSpec(
        (nn, gd * rb, 128), lambda i: (0, (i * kpt) // (span * gd), 0)
    )


@functools.partial(
    jax.jit, static_argnames=("level", "n", "m", "N", "interpret")
)
def schur_update_level_flat(
    FLl: jax.Array,            # [nn, R, 128] flat level-L multiplier slab
    FLx: jax.Array,
    FLu: jax.Array,            # [mn, R, 128]
    Fls: Sequence[jax.Array],  # U upper-level slabs [nn, R, 128]
    Fxs: Sequence[jax.Array],
    Fus: Sequence[jax.Array],
    fsol: Sequence[jax.Array],  # U compact solved separators [nn, G*rb, 128]
    Asep: Optional[jax.Array] = None,  # [nn, G2*rb, 128] A at next-level seps
    Bsep: Optional[jax.Array] = None,  # [nm, G2*rb, 128]
    *,
    level: int,
    n: int,
    m: int,
    N: int,
    interpret: bool = False,
):
    """Apply the level-``level`` Schur updates + separator write-back to
    every upper-level slab in one HBM pass per slab (flat-plane layout).

    Returns ``(Fls, Fxs, Fus, S_next)`` with slab inputs donated; S_next is
    the per-upper-level list of next-level inner products
    ``[nn, G2*rb, 128]`` when emission applies (shallow levels), else None.
    """
    nn, R, _ = FLl.shape
    mn = m * n
    B = R * 128 // N
    logb = B.bit_length() - 1
    U = len(Fls)
    rb, kpt, t1, span, gd, gd2 = _flat_geometry(level, N, B)
    emit = gd2 > 0 and Asep is not None
    if not emit:
        gd2 = 0

    grid = (R // t1,)
    slab = lambda e: pl.BlockSpec((e, t1, 128), lambda i: (0, i, 0))
    f_spec = _fs_spec(nn, gd, rb, span, kpt)
    ex_spec = lambda e: pl.BlockSpec((e, gd2 * rb, 128), lambda i: (0, i, 0))
    in_specs = (
        [slab(nn), slab(nn), slab(mn)]
        + [slab(nn)] * U
        + [slab(nn)] * U
        + [slab(mn)] * U
        + [f_spec] * U
    )
    args = [FLl, FLx, FLu, *Fls, *Fxs, *Fus, *fsol]
    if emit:
        in_specs += [ex_spec(nn), ex_spec(mn)]
        args += [Asep, Bsep]
    out_specs = [slab(nn)] * U + [slab(nn)] * U + [slab(mn)] * U
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fls]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fxs]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fus]
    )
    if emit:
        G2 = N // (2 * span)
        dt = fsol[0].dtype
        out_specs += [ex_spec(nn)] * U
        out_shape += [jax.ShapeDtypeStruct((nn, G2 * rb, 128), dt)] * U
    aliases = {}
    for u in range(U):
        aliases[3 + u] = u
        aliases[3 + U + u] = U + u
        aliases[3 + 2 * U + u] = 2 * U + u
    kernel = functools.partial(
        _update_kernel_flat, n=n, m=m, level=level, t1=t1, t2=128, rb=rb,
        U=U, gd=gd, gd2=gd2, leaf_depth=0, N=N, logb=logb,
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
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*args)
    slabs = tuple(outs[:U]), tuple(outs[U : 2 * U]), tuple(outs[2 * U : 3 * U])
    if not emit:
        return slabs + (None,)
    return slabs + (list(outs[3 * U : 4 * U]),)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "n", "m", "N", "interpret", "factor_dtype"),
)
def leaf_schur_level0_flat(
    A: jax.Array,      # [nn, R, 128] flat element-major dynamics
    B: jax.Array,      # [nm, R, 128]
    qinv: jax.Array,   # [n, R, 128]
    rinv: jax.Array,   # [m, R, 128]
    S0: jax.Array,     # [nn, G0*rb, 128] level-0 Sbar
    fsol: Sequence[jax.Array],  # U = depth-1 solved level-0 separators
    Asep: jax.Array,   # [nn, G1*rb, 128] A at level-1 separator knots
    Bsep: jax.Array,   # [nm, G1*rb, 128]
    *,
    depth: int,
    n: int,
    m: int,
    N: int,
    interpret: bool = False,
    factor_dtype: str = "",
):
    """Fused leaf construction + level-0 Schur update, flat-plane layout.

    Every factor slab is written to HBM exactly once, already carrying the
    level-0 update; the level-1 inner products are emitted (with the
    level-1 Sbar fold). See :func:`schur_update_level_flat` and the
    [nn, N, B] twin ``ops.schur_pallas.leaf_schur_level0_em``.
    """
    nn, R, _ = A.shape
    mn = m * n
    Bb = R * 128 // N
    logb = Bb.bit_length() - 1
    U = depth - 1
    level = 0
    fdt = jnp.dtype(factor_dtype) if factor_dtype else A.dtype
    rb, kpt, t1, span, gd, gd2 = _flat_geometry(level, N, Bb)
    assert gd2 > 0, (N, kpt)

    grid = (R // t1,)
    slab = lambda e: pl.BlockSpec((e, t1, 128), lambda i: (0, i, 0))
    f_spec = _fs_spec(nn, gd, rb, span, kpt)
    ex_spec = lambda e: pl.BlockSpec((e, gd2 * rb, 128), lambda i: (0, i, 0))
    in_specs = (
        [slab(nn), slab(mn), slab(n), slab(m), f_spec]
        + [f_spec] * U
        + [ex_spec(nn), ex_spec(mn)]
    )
    out_specs = (
        [slab(nn), slab(nn), slab(mn)]
        + [slab(nn)] * U
        + [slab(nn)] * U
        + [slab(mn)] * U
        + [ex_spec(nn)] * U
    )
    dt = fsol[0].dtype if U else S0.dtype
    G2 = N // (2 * span)
    out_shape = (
        [
            jax.ShapeDtypeStruct((nn, R, 128), fdt),
            jax.ShapeDtypeStruct((nn, R, 128), fdt),
            jax.ShapeDtypeStruct((mn, R, 128), fdt),
        ]
        + [jax.ShapeDtypeStruct((nn, R, 128), fdt)] * U
        + [jax.ShapeDtypeStruct((nn, R, 128), fdt)] * U
        + [jax.ShapeDtypeStruct((mn, R, 128), fdt)] * U
        + [jax.ShapeDtypeStruct((nn, G2 * rb, 128), dt)] * U
    )
    kernel = functools.partial(
        _update_kernel_flat, n=n, m=m, level=level, t1=t1, t2=128, rb=rb,
        U=U, gd=gd, gd2=gd2, leaf_depth=depth, N=N, logb=logb,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(A, B, qinv, rinv, S0, *fsol, Asep, Bsep)
    ol0, ox0, ou0 = outs[0:3]
    rest = outs[3:]
    Fls = (ol0,) + tuple(rest[:U])
    Fxs = (ox0,) + tuple(rest[U : 2 * U])
    Fus = (ou0,) + tuple(rest[2 * U : 3 * U])
    return Fls, Fxs, Fus, list(rest[3 * U : 4 * U])


@functools.partial(
    jax.jit, static_argnames=("level", "n", "m", "N", "interpret")
)
def rhs_update_level_flat(
    Fl: jax.Array,    # [nn, R, 128] factor slab of this level
    Fx: jax.Array,
    Fu: jax.Array,    # [mn, R, 128]
    zy: jax.Array,    # [n, R, 128] RHS planes
    zx: jax.Array,
    zu: jax.Array,    # [m, R, 128]
    zbar: jax.Array,  # [n, G*rb, 128] solved separator RHS, compact
    *,
    level: int,
    n: int,
    m: int,
    N: int,
    interpret: bool = False,
):
    """One RHS-sweep level (ref solve.c:137-182) as a single flat-plane HBM
    pass over the level's factor slab; z inputs donated."""
    nn, R, _ = Fl.shape
    mn = m * n
    B = R * 128 // N
    logb = B.bit_length() - 1
    rb, kpt, t1, span, gd, _ = _flat_geometry(level, N, B)

    grid = (R // t1,)
    slab = lambda e: pl.BlockSpec((e, t1, 128), lambda i: (0, i, 0))
    zb_spec = _fs_spec(n, gd, rb, span, kpt)
    kernel = functools.partial(
        _rhs_kernel_flat, n=n, m=m, level=level, t1=t1, t2=128, rb=rb,
        gd=gd, logb=logb,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            slab(nn), slab(nn), slab(mn), slab(n), slab(n), slab(m), zb_spec
        ],
        out_specs=[slab(n), slab(n), slab(m)],
        out_shape=[
            jax.ShapeDtypeStruct(zy.shape, zy.dtype),
            jax.ShapeDtypeStruct(zx.shape, zx.dtype),
            jax.ShapeDtypeStruct(zu.shape, zu.dtype),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(Fl, Fx, Fu, zy, zx, zu, zbar)

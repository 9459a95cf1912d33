"""Pallas TPU kernel: fused Schur-complement update for one tree level.

TPU-native heir of the reference's hand-tuned micro-kernels
(``src/matmul.c:31-574``, AVX2-unrolled 4x4/5x5/8x8 matmuls) applied to the
solver's hottest stage, the Schur updates of ``ndlqr_UpdateShurFactor``
(nested_dissection.c:154-171, driven by solve.c:119-131):

    for every knot k and every upper level u > L:
        Flambda[u][k] = fsol[u][group(k)]                 at sep+1 knots
        Flambda[u][k] -= Flambda[L][k] @ f_u[group(k)]    (masked) else
        Fstate[u][k]  -= Fstate[L][k]  @ f_u[group(k)]
        Finput[u][k]  -= Finput[L][k]  @ f_u[group(k)]

This stage is ~2/3 of the solve's HBM traffic (every upper slab read +
written once per level). The kernel enforces exactly one HBM pass:

* **Element-major layout** ``[n*n, N, B]``: each block element is a dense
  ``[knots, batch]`` plane, so every FMA runs on full (8, 128) f32 tiles —
  the knot-major layout would waste 6/8 sublanes per element slice.
* **All upper levels in ONE kernel invocation** (separate refs per level,
  unrolled loop in the body): the level-L multiplier blocks load to VMEM
  once per (knot, batch) tile and feed every upper level's update — XLA
  re-reads them per level.
* The separator write-back (``fsol`` into the lambda slab at sep+1 knots)
  and the calc_lambda mask (knots that are multiples of 2^L skip the lambda
  update, except knot 0 — nested_dissection.c:173-177) fuse into the same
  single write per output element.
* **Next-level separator extracts**: when the tile covers whole next-level
  groups, the kernel additionally emits the four compact separator arrays
  the NEXT level's inner products read (x@sep, x@sep+1, lambda@sep+1,
  input@sep — ndlqr_FactorInnerProduct, nested_dissection.c:114-134).
  Without them the products stage re-reads the full slabs with a stride,
  which on (8,128) tiles costs near-full-slab traffic per upper level.
* In/out aliasing: each upper slab is updated in place (no extra buffers).

The tiny block matmul unrolls to VPU lane math; the solved separator blocks
``fsol`` broadcast over each group's rows (at most 4 groups per tile).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, n, m, level, tk, tb, span, U, gd, gd2):
    nn, mn = n * n, m * n
    emit = gd2 > 0
    fll, flx, flu = refs[0:3]
    fls = refs[3 : 3 + U]
    fxs = refs[3 + U : 3 + 2 * U]
    fus = refs[3 + 2 * U : 3 + 3 * U]
    fss = refs[3 + 3 * U : 3 + 4 * U]
    outs = refs[3 + 4 * U :]
    ols, oxs, ous = outs[0:U], outs[U : 2 * U], outs[2 * U : 3 * U]
    if emit:
        oxm = outs[3 * U : 4 * U]  # x @ next sep
        oxn = outs[4 * U : 5 * U]  # x @ next sep+1
        oln = outs[5 * U : 6 * U]  # lambda @ next sep+1
        oum = outs[6 * U : 7 * U]  # input @ next sep

    i = pl.program_id(0)
    halfspan = 1 << level
    rpg = max(tk // gd, 1)  # rows per group within the tile

    knots = i * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
    # calc_lambda (nested_dissection.c:173-177): multiples of 2^level are
    # range starts and skip the lambda update, except knot 0. For level 0
    # this keeps only knot 0 — correct: every knot is some leaf node's
    # range start.
    keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)
    # Separator write positions: knot == sep+1 <=> knot % span == 2^level.
    sep = (knots & (span - 1)) == halfspan
    fdt = fll.dtype  # slab storage dtype (may be bf16; math runs f32)

    for u in range(U):
        fs = fss[u]  # [gd, nn, tb] block of the group-major [G, nn, B] array

        def fplane(e):
            """Broadcast solved-separator element e over its group's rows."""
            if gd == 1:
                return jnp.broadcast_to(fs[0, e][None, :], (tk, tb))
            parts = [
                jnp.broadcast_to(fs[g, e][None, :], (rpg, tb))
                for g in range(gd)
            ]
            return jnp.concatenate(parts, axis=0)

        fpl = [fplane(e) for e in range(nn)]

        def mm(FL, p):
            """``FL @ f`` unrolled: p*n output planes of [tk, tb] FMAs."""
            outs = []
            for i_ in range(p):
                for k_ in range(n):
                    acc = FL[i_ * n] * fpl[k_]
                    for j in range(1, n):
                        acc = acc + FL[i_ * n + j] * fpl[j * n + k_]
                    outs.append(acc)
            return outs

        ul = mm(fll, n)
        ux = mm(flx, n)
        uu = mm(flu, m)
        for e in range(nn):
            vl = jnp.where(sep, fpl[e], fls[u][e] - jnp.where(keep, ul[e], 0.0))
            vx = fxs[u][e] - ux[e]
            ols[u][e] = vl.astype(fdt)
            oxs[u][e] = vx.astype(fdt)
            if emit:
                for g2 in range(gd2):
                    r = g2 * 2 * span + span - 1  # next level's separator
                    oxm[u][g2, e] = vx[r].astype(oxm[u].dtype)
                    oxn[u][g2, e] = vx[r + 1].astype(oxn[u].dtype)
                    oln[u][g2, e] = vl[r + 1].astype(oln[u].dtype)
        for e in range(mn):
            vu = fus[u][e] - uu[e]
            ous[u][e] = vu.astype(fdt)
            if emit:
                for g2 in range(gd2):
                    r = g2 * 2 * span + span - 1
                    oum[u][g2, e] = vu[r].astype(oum[u].dtype)


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
    level: int,
    n: int,
    m: int,
    interpret: bool = False,
    tb: int = 128,
):
    """Apply the level-``level`` Schur updates + separator write-back to
    every upper-level slab in one HBM pass per slab.

    Returns ``(Fls, Fxs, Fus, extracts)`` with inputs donated. ``extracts``
    is ``None`` when the next level's span exceeds the knot tile; otherwise
    a tuple ``(xm, xn, ln, um)`` of per-u lists of group-major
    ``[G_next, nn|mn, B]`` arrays: the updated slab values at the next
    level's separator / separator+1 knots."""
    nn, N, B = FLl.shape
    mn = m * n
    U = len(Fls)
    span = 1 << (level + 1)
    # Tile the knot axis to cover whole next-level groups where VMEM allows,
    # so the kernel can emit the compact separator extracts. bf16 slabs need
    # 16-row tiles (the (16, 128) bf16 memory tile).
    min_tk = 16 if FLl.dtype == jnp.bfloat16 else 8
    tk = min(max(2 * span, min_tk), 2 * min_tk, N)
    gd = max(tk // span, 1)
    gd2 = tk // (2 * span) if 2 * span <= tk and N >= 2 * span else 0
    tb = min(tb, B)
    if N % tk or B % tb:
        raise ValueError(f"N={N} B={B} not divisible by tiles ({tk},{tb})")

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
    out_specs = [slab_spec(nn)] * U + [slab_spec(nn)] * U + [slab_spec(mn)] * U
    out_shape = (
        [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fls]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fxs]
        + [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in Fus]
    )
    if gd2:
        G2 = N // (2 * span)
        dt = fsol[0].dtype  # separator math precision (f32 even for bf16 slabs)
        for width in (nn, nn, nn, mn):
            out_specs += [ex_spec(width)] * U
            out_shape += [jax.ShapeDtypeStruct((G2, width, B), dt)] * U
    aliases = {}
    for k in range(U):
        aliases[3 + k] = k               # Fl_u -> ol_u
        aliases[3 + U + k] = U + k       # Fx_u -> ox_u
        aliases[3 + 2 * U + k] = 2 * U + k
    kernel = functools.partial(
        _kernel, n=n, m=m, level=level, tk=tk, tb=tb, span=span, U=U,
        gd=gd, gd2=gd2,
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
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(FLl, FLx, FLu, *Fls, *Fxs, *Fus, *fsol)
    slabs = tuple(outs[:U]), tuple(outs[U : 2 * U]), tuple(outs[2 * U : 3 * U])
    if not gd2:
        return slabs + (None,)
    ex = tuple(
        tuple(outs[(3 + w) * U : (4 + w) * U]) for w in range(4)
    )  # (xm, xn, ln, um), each a per-u tuple
    return slabs + (ex,)

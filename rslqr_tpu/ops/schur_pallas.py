"""Pallas TPU kernel: fused Schur-complement update for one tree level.

TPU-native heir of the reference's hand-tuned micro-kernels
(``src/matmul.c:31-574``, AVX2-unrolled 4x4/5x5/8x8 matmuls) applied to the
solver's hottest stage, the Schur updates of ``ndlqr_UpdateShurFactor``
(nested_dissection.c:154-171, driven by solve.c:119-131):

    for every knot k and every upper level u > L:
        Flambda[u][k] -= Flambda[L][k] @ f_u[group(k)]    (masked)
        Fstate[u][k]  -= Fstate[L][k]  @ f_u[group(k)]
        Finput[u][k]  -= Finput[L][k]  @ f_u[group(k)]

One kernel invocation processes all upper levels and all three factor slabs
with the batch on the 128-lane axis: the grid is (knot-tiles, batch-tiles,
upper-levels) with the upper-level dimension innermost, so the level-L
multiplier blocks are fetched to VMEM once per (knot, batch) tile and reused
across every upper level (XLA re-reads them per level). The tiny block
matmul unrolls to VPU lane math; the calc_lambda mask (knots that are
multiples of 2^L skip the lambda row, except knot 0) is computed from the
knot ids with bit arithmetic.

Block arrays are flattened: ``[*, nn=n*n, B]`` (row-major blocks), so every
``(i, j)`` element slice is a clean ``[TK, TB]`` tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(fll_ref, flx_ref, flu_ref, fl_ref, fx_ref, fu_ref, fs_ref,
            ol_ref, ox_ref, ou_ref, *, n, m, level, tk, span, gd):
    i = pl.program_id(0)
    halfspan = 1 << level

    FLl = fll_ref[...]  # [TK, nn, TB]
    FLx = flx_ref[...]
    FLu = flu_ref[...]  # [TK, mn, TB]
    Fl = fl_ref[0]      # [TK, nn, TB]
    Fx = fx_ref[0]
    Fu = fu_ref[0]

    # calc_lambda (nested_dissection.c:173-177): knots that are multiples of
    # 2^level are range starts and skip the lambda update, except knot 0.
    knots = i * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
    # Masked knots are exactly the multiples of 2^level (both range starts);
    # knot 0 is exempt. For level 0 this masks every knot but 0 — correct:
    # every knot is some leaf node's range start (binarytree structure).
    keep = jnp.logical_or((knots & (halfspan - 1)) != 0, knots == 0)

    rows_per_g = span if gd > 1 else tk

    def mm(FL, f, p):
        """FL @ f for one group's rows, unrolled; p = block rows."""
        outs = []
        for i_ in range(p):
            for k_ in range(n):
                acc = FL[:, i_ * n, :] * f[k_, :]
                for j in range(1, n):
                    acc = acc + FL[:, i_ * n + j, :] * f[j * n + k_, :]
                outs.append(acc)
        return jnp.stack(outs, axis=1)  # [rows, p*n, TB]

    upd_l = []
    upd_x = []
    upd_u = []
    for g in range(gd):
        sl = slice(g * rows_per_g, (g + 1) * rows_per_g)
        f = fs_ref[0, g]  # [nn, TB]
        upd_l.append(mm(FLl[sl], f, n))
        upd_x.append(mm(FLx[sl], f, n))
        upd_u.append(mm(FLu[sl], f, m))
    ul = jnp.concatenate(upd_l, axis=0) if gd > 1 else upd_l[0]
    ux = jnp.concatenate(upd_x, axis=0) if gd > 1 else upd_x[0]
    uu = jnp.concatenate(upd_u, axis=0) if gd > 1 else upd_u[0]

    keep3 = keep[:, :, None]
    ol_ref[0] = Fl - jnp.where(keep3, ul, 0.0)
    ox_ref[0] = Fx - ux
    ou_ref[0] = Fu - uu


@functools.partial(
    jax.jit, static_argnames=("level", "n", "m", "interpret", "tk", "tb")
)
def schur_update_level(
    FLl: jax.Array,   # [N, nn, B]  level-L lambda multiplier blocks
    FLx: jax.Array,   # [N, nn, B]
    FLu: jax.Array,   # [N, mn, B]
    Fls: jax.Array,   # [U, N, nn, B]  stacked upper-level slabs
    Fxs: jax.Array,   # [U, N, nn, B]
    Fus: jax.Array,   # [U, N, mn, B]
    fsol: jax.Array,  # [U, G, nn, B]  solved separator blocks per group
    level: int,
    n: int,
    m: int,
    interpret: bool = False,
    tk: int = 8,
    tb: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Apply the level-``level`` Schur updates to every upper-level slab."""
    U, N, nn, B = Fls.shape
    mn = m * n
    span = 1 << (level + 1)
    tk = min(tk, N)
    if span > tk and span % tk != 0:
        raise ValueError(f"span {span} not compatible with tile {tk}")
    gd = max(tk // span, 1)
    tb = min(tb, B)
    if N % tk or B % tb:
        raise ValueError(f"N={N} B={B} not divisible by tiles ({tk},{tb})")

    grid = (N // tk, B // tb, U)
    in_specs = [
        pl.BlockSpec((tk, nn, tb), lambda i, j, u: (i, 0, j)),
        pl.BlockSpec((tk, nn, tb), lambda i, j, u: (i, 0, j)),
        pl.BlockSpec((tk, mn, tb), lambda i, j, u: (i, 0, j)),
        pl.BlockSpec((1, tk, nn, tb), lambda i, j, u: (u, i, 0, j)),
        pl.BlockSpec((1, tk, nn, tb), lambda i, j, u: (u, i, 0, j)),
        pl.BlockSpec((1, tk, mn, tb), lambda i, j, u: (u, i, 0, j)),
        pl.BlockSpec(
            (1, gd, nn, tb),
            lambda i, j, u: (u, (i * tk) // (span * gd), 0, j),
        ),
    ]
    out_specs = [
        pl.BlockSpec((1, tk, nn, tb), lambda i, j, u: (u, i, 0, j)),
        pl.BlockSpec((1, tk, nn, tb), lambda i, j, u: (u, i, 0, j)),
        pl.BlockSpec((1, tk, mn, tb), lambda i, j, u: (u, i, 0, j)),
    ]
    kernel = functools.partial(
        _kernel, n=n, m=m, level=level, tk=tk, span=span, gd=gd
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct(Fls.shape, Fls.dtype),
            jax.ShapeDtypeStruct(Fxs.shape, Fxs.dtype),
            jax.ShapeDtypeStruct(Fus.shape, Fus.dtype),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(FLl, FLx, FLu, Fls, Fxs, Fus, fsol)

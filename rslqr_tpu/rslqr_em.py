"""Element-major rsLQR solve — the production TPU path for small blocks.

Same algorithm as :mod:`rslqr_tpu.rslqr` (recursive Schur complement over the
knot-point tree, ref solve.c:38-190), with the factor slabs re-laid-out from
knot-major ``[N, p, q, *b]`` to element-major ``[p, q, N, *b]``: block dims
LEADING, the (knot x batch) plane MINOR.

Why: the TPU f32 memory tile is (8 sublanes, 128 lanes) over the two minor
axes. Knot-major puts the tiny block dim (n=6) on sublanes, so every
per-element slice the unrolled Cholesky/substitution kernels take reads 6/8
sublanes of strided sub-tiles, and the (knot-broadcast) Schur multiplier
lives in a padded layout. Element-major moves all block indexing onto MAJOR
axes — free slices — and every lane op runs on dense ``[N, B]`` tiles at
full sublane/lane occupancy. This is the same inversion the reference's
AVX2 micro-kernels apply (matmul.c:84-574: unroll the tiny block, vectorize
the long axis), applied to the (knot x batch) plane instead of one block.

Mechanically the layout change is free: the batched kernels in
:mod:`rslqr_tpu.linalg` take the number of trailing batch axes as a
parameter, so element-major is exactly "treat the knot axis as one more
batch axis" (``nbatch + 1``). No new numerics — correctness is pinned to
the grid path (itself pinned to the reference's golden intermediate
factors) by tests/test_rslqr_em.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import linalg as la
from .problem import LQRProblem, pack_solution
from .rslqr import RsLqrSolution, _bf, _lambda_mask, _to_batch_last
from .tree import TreeTables, build_tree_tables


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmFactorization:
    """Element-major factorization state (NdLqrCholeskyFactors analogue,
    cholesky_factors.h:30-35, plus the final factor slabs).

    ``Fls``/``Fxs``/``Fus``: tuple over levels of ``[{n,n,m}, n, N, *b]``
    post-sweep factor slabs, consumed by the cached RHS sweep.
    ``chols``: tuple over levels of ``[n, n, G_level, *b]`` Cholesky factors.
    """

    Fls: Tuple
    Fxs: Tuple
    Fus: Tuple
    chols: Tuple
    nbatch: int = dataclasses.field(metadata=dict(static=True), default=0)


def _em(x: jax.Array) -> jax.Array:
    """Batch-last blocks ``[N, p, q, *b]`` -> element-major ``[p, q, N, *b]``."""
    return jnp.moveaxis(x, 0, 2)


def _emv(x: jax.Array) -> jax.Array:
    """Batch-last block vectors ``[N, p, *b]`` -> element-major ``[p, N, *b]``."""
    return jnp.moveaxis(x, 0, 1)


def _emv_bl(x: jax.Array) -> jax.Array:
    return jnp.moveaxis(x, 1, 0)


def _gk(x: jax.Array, span: int, nb: int) -> jax.Array:
    """Group the knot axis (at position ``-(nb+1)``): ``[..., N, *b] ->
    [..., G, span, *b]`` — a free reshape; all level indexing is then static
    slices of the span axis (see rslqr._group)."""
    k = x.ndim - nb - 1
    return x.reshape(x.shape[:k] + (x.shape[k] // span, span) + x.shape[k + 1:])


def _ugk(x: jax.Array, nb: int) -> jax.Array:
    k = x.ndim - nb - 2
    return x.reshape(x.shape[:k] + (x.shape[k] * x.shape[k + 1],) + x.shape[k + 2:])


def _sel(x: jax.Array, idx: int, nb: int) -> jax.Array:
    """Select one span position: ``[..., G, span, *b] -> [..., G, *b]``."""
    return x[(Ellipsis, idx) + (slice(None),) * nb]


def _kmask(sel: np.ndarray, lead: int, nb: int) -> jax.Array:
    """Static bool over knots/groups -> broadcastable with ``lead`` leading
    block axes and ``nb`` trailing batch axes."""
    return jnp.asarray(sel.reshape((1,) * lead + sel.shape + (1,) * nb))


def _leaf_masks(levels: np.ndarray, N: int, depth: int):
    """Static per-level leaf-ownership masks over knots (ref
    nested_dissection.c:10-105 index logic via the tree tables)."""
    ks = np.arange(N)
    own = [  # knots 1 <= k < N-1 whose own-dynamics blocks live at level L
        (levels[np.minimum(ks, N - 2)] == L) & (ks >= 1) & (ks < N - 1)
        for L in range(depth)
    ]
    prev = [  # knots k >= 1 whose previous-step block lives at level(k-1)
        np.concatenate([[False], levels == L]) for L in range(depth)
    ]
    return own, prev


def _leaf_em(pbl: LQRProblem, levels: np.ndarray, depth: int, nb: int,
             factor_dtype: str = ""):
    """Phase 1 (ref nested_dissection.c:10-105) in element-major layout.

    Every knot-indexed scatter of the grid path (rslqr._leaf_solve) becomes
    a static-mask ``where`` over dense ``[N, *b]`` planes.
    """
    N, n = pbl.A.shape[0], pbl.A.shape[1]
    m = pbl.B.shape[2]
    dtype = pbl.A.dtype
    b_shape = pbl.A.shape[3:]

    A = _em(pbl.A)  # [n, n, N, *b]
    B = _em(pbl.B)  # [n, m, N, *b]
    At = jnp.swapaxes(A, 0, 1)
    Bt = jnp.swapaxes(B, 0, 1)  # [m, n, N, *b]
    q_ = _emv(pbl.q)  # [n, N, *b]
    r_ = _emv(pbl.r)
    f_ = _emv(pbl.f)
    Qd = _emv(pbl.Qdiag)
    Rd = _emv(pbl.Rdiag)
    qinv, rinv = 1.0 / Qd, 1.0 / Rd

    QiAt = At * qinv[:, None]  # row i scaled by 1/Q_i
    RiBt = Bt * rinv[:, None]

    ks = np.arange(N)
    knot0 = ks == 0
    own, prev = _leaf_masks(levels, N, depth)

    eye = jnp.eye(n, dtype=dtype).reshape((n, n, 1) + (1,) * nb)
    Fls: List[jax.Array] = []
    Fxs: List[jax.Array] = []
    Fus: List[jax.Array] = []
    for L in range(depth):
        mo = _kmask(own[L], 2, nb)
        mp = _kmask(prev[L], 2, nb)
        # F[L, k].state = Q_k^{-1} A_k' (own) or -Q_k^{-1} I (prev)
        # (ref nested_dissection.c:81-102).
        Fxs.append(
            jnp.where(mo, QiAt, 0.0) - jnp.where(mp, eye * qinv[None], 0.0)
        )
        if L == 0:
            # Knot 0: F[0,0].input = R_0^{-1} B_0', F[0,0].lambda = -A_0'
            # (ref nested_dissection.c:24-58).
            Fus.append(jnp.where(_kmask(own[L] | knot0, 2, nb), RiBt, 0.0))
            Fls.append(jnp.where(_kmask(knot0, 2, nb), -At, 0.0))
        else:
            Fus.append(jnp.where(mo, RiBt, 0.0))
            Fls.append(jnp.zeros((n, n, N) + b_shape, dtype))

    if factor_dtype:
        # Experimental traffic-halving storage (STATUS.md): factor slabs in
        # bf16, all separator math and the RHS in full precision.
        fdt = jnp.dtype(factor_dtype)
        Fls = [x.astype(fdt) for x in Fls]
        Fxs = [x.astype(fdt) for x in Fxs]
        Fus = [x.astype(fdt) for x in Fus]

    zy, zx, zu = _leaf_z(pbl, nb)
    return Fls, Fxs, Fus, A, B, zy, zx, zu


def _leaf_z(pbl: LQRProblem, nb: int):
    """Negated, leaf-transformed RHS planes (ref solver.c:187-190 +
    nested_dissection.c:42-90; see rslqr._leaf_rhs_transform)."""
    N = pbl.A.shape[0]
    q_ = _emv(pbl.q)  # [n, N, *b]
    r_ = _emv(pbl.r)
    f_ = _emv(pbl.f)
    Qd = _emv(pbl.Qdiag)
    Rd = _emv(pbl.Rdiag)
    qinv, rinv = 1.0 / Qd, 1.0 / Rd
    ks = np.arange(N)
    m0 = _kmask(ks == 0, 1, nb)
    mlast = _kmask(ks == N - 1, 1, nb)
    zy0 = jnp.concatenate(
        [-pbl.x0[:, None], -f_[:, :-1]], axis=1
    )  # [n, N, *b]: zy[k] = -f[k-1], zy[0] = -x0
    zy = jnp.where(m0, -Qd[:, :1] * zy0 + q_, zy0)
    zx = jnp.where(m0, -zy0, -q_ * qinv)
    zu = jnp.where(mlast, -r_, -r_ * rinv)
    return zy, zx, zu


def _em_from_gm(x: jax.Array, p: int, q: int) -> jax.Array:
    """Group-major kernel extract ``[G, p*q, B]`` -> ``[p, q, G, B]``."""
    G, _, B = x.shape
    return jnp.moveaxis(x, 0, 1).reshape(p, q, G, B)


def _sweep_level_em(A, B, level, depth, Fls, Fxs, Fus, n, m, nb, ex=None,
                    options=None):
    """One level of the factorization sweep (ref solve.c:68-134) in
    element-major layout; mutates the slab lists, returns the level's
    Cholesky factors ``[n, n, G, *b]`` and the next level's separator
    extracts (or None).

    Same four phases as rslqr._sweep_level_core; all linalg runs through the
    small-block kernels with the knot axis as an extra batch axis. The inner
    products read either the compact extracts emitted by the previous
    level's Pallas kernel (``ex``) or strided slab slices.
    """
    Ss = _level_products_em(A, B, level, depth, Fls, Fxs, Fus, nb, ex, n)
    Lc = la.bcholesky(Ss[0], nb + 1)
    if ex is None:
        _level_writeback_em(Fls, level, Ss[0], nb)
    fsols = _level_cholsolve_em(Lc, Ss, level, nb)

    if level + 1 < depth:
        mode = _pallas_schur_mode(Fls[0].dtype, nb, A.shape[2], A.shape[3:],
                                  n, options)
        if mode is not None:
            if _flat_path_ok(
                Fls[0].dtype, nb, A.shape[2], A.shape[3:], options
            ):
                S_next = _schur_flat(
                    A, B, level, depth, Fls, Fxs, Fus, fsols, n, m, mode
                )
            else:
                S_next = _schur_pallas(
                    A, B, level, depth, Fls, Fxs, Fus, fsols, n, m, mode
                )
            return Lc, S_next
        interp = _planes_update_interp(Fls[0], nb)
        if interp is not None:
            _level_update_planes_em(
                level, depth, Fls, Fxs, Fus, fsols, nb, interp
            )
        else:
            _level_update_xla_em(level, depth, Fls, Fxs, Fus, fsols, nb)
    return Lc, None


def _level_products_em(A, B, level, depth, Fls, Fxs, Fus, nb, ex, n):
    """Inner products for every upper level (ndlqr_FactorInnerProduct,
    nested_dissection.c:114-134): either pass through the compact arrays
    emitted by the previous level's kernel or compute from slab slices."""
    if ex is not None:
        # Kernel-emitted products: [G, nn, B] group-major from the [nn,N,B]
        # kernels, already-element-major [n, n, G, B] from the flat path.
        return [S if S.ndim == 4 else _em_from_gm(S, n, n) for S in ex]
    span = 1 << (level + 1)
    mid = (1 << level) - 1
    nk = nb + 1
    A_sep = _sel(_gk(A, span, nb), mid, nb)  # [n, n, G, *b]
    B_sep = _sel(_gk(B, span, nb), mid, nb)
    Ss = []
    for u in range(level, depth):
        gl = _gk(Fls[u], span, nb)
        gx = _gk(Fxs[u], span, nb)
        gu = _gk(Fus[u], span, nb)
        Ss.append(
            la.bgemm(A_sep, _sel(gx, mid, nb), nk)
            + la.bgemm(B_sep, _sel(gu, mid, nb), nk)
            - _sel(gx, mid + 1, nb)
            - _sel(gl, mid + 1, nb)
        )
    return Ss


def _level_writeback_em(Fls, level, S, nb):
    """Separator write-back of this level's Sbar into its lambda slab
    (ref solve.c:92-97 placement); mutates ``Fls``. The kernel path folds
    this into the upstream store instead.

    Written as a functional scatter on the grouped view (one row per
    group) rather than a full-slab ``where`` so XLA lowers it as an
    in-place dynamic-update-slice, not a slab-sized copy."""
    span = 1 << (level + 1)
    mid = (1 << level) - 1
    gl = _gk(Fls[level], span, nb)  # [n, n, G, span, *b]
    idx = (Ellipsis, mid + 1) + (slice(None),) * nb
    Fls[level] = _ugk(gl.at[idx].set(S.astype(gl.dtype)), nb)


def _level_cholsolve_em(Lc, Ss, level, nb):
    """Cached-Cholesky solves of the upper-level products
    (ndlqr_SolveCholeskyFactor, nested_dissection.c:136-152).

    All upper levels solve in ONE stacked-RHS substitution (width n*U
    instead of U separate width-n solves): the unrolled lane kernels do
    identical FLOPs either way, but the factor planes load once and the
    per-call XLA stage overhead drops U-fold."""
    sols = _cholsolve_stacked(Lc, Ss[1:], nb)
    return {level + 1 + i: s for i, s in enumerate(sols)}


def _cholsolve_stacked(Lc, Ss, nb):
    """Solve a list of equal-shape block RHS against one cached factor as a
    single stacked substitution (width n*len(Ss)); returns the split list.

    Small-block (unrolled lane) regime only: the mid-block planes
    cho-solve kernel holds the whole RHS block in VMEM, and a stacked
    width-n*U RHS at nx=36 exceeds the 128 MB budget (measured: 175 MB
    requested, quadruped rslqr compile OOM)."""
    n = Lc.shape[-(nb + 3)]
    if len(Ss) <= 1 or n > la.small_block_threshold():
        return [la.bcho_solve(Lc, S, nb + 1) for S in Ss]
    n = Ss[0].shape[-(nb + 3)]
    qax = Ss[0].ndim - (nb + 2)  # block-column axis of [.., n, n, *b]
    sol = la.bcho_solve(Lc, jnp.concatenate(Ss, axis=qax), nb + 1)
    idx = lambda i: (slice(None),) * qax + (slice(i * n, (i + 1) * n),)
    return [sol[idx(i)] for i in range(len(Ss))]


def _level_update_xla_em(level, depth, Fls, Fxs, Fus, fsols, nb):
    """XLA fallback for the Schur update stage (ndlqr_UpdateShurFactor,
    nested_dissection.c:154-171); mutates the slab lists."""
    N = Fls[level].shape[2]
    span = 1 << (level + 1)
    mid = (1 << level) - 1
    G = N // span
    nk = nb + 1
    sepw = np.zeros((G, span), dtype=bool)
    sepw[:, mid + 1] = True
    ms = _kmask(sepw, 2, nb)
    keep = _kmask(_lambda_mask(N, span, mid + 1), 2, nb)
    FL_l = _gk(Fls[level], span, nb)
    FL_x = _gk(Fxs[level], span, nb)
    FL_u = _gk(Fus[level], span, nb)
    fdt = Fls[0].dtype
    for u in range(level + 1, depth):
        f_u = jnp.expand_dims(fsols[u], -(nb + 1))  # [n, n, G, 1, *b]
        # Explicit span broadcast: the small-block reduce gemm broadcasts
        # implicitly, but the mid-block MXU fallback (dot_general) needs
        # equal batch dims.
        f_u = jnp.broadcast_to(
            f_u,
            f_u.shape[: f_u.ndim - (nb + 1)]
            + (span,)
            + f_u.shape[f_u.ndim - nb:],
        )
        upd_l = la.bgemm(FL_l, f_u, nk + 1)
        Fls[u] = _ugk(
            jnp.where(
                ms,
                f_u,
                _gk(Fls[u], span, nb) - jnp.where(keep, upd_l, 0.0),
            ).astype(fdt),
            nb,
        )
        Fxs[u] = _ugk(
            (_gk(Fxs[u], span, nb) - la.bgemm(FL_x, f_u, nk + 1)).astype(fdt),
            nb,
        )
        Fus[u] = _ugk(
            (_gk(Fus[u], span, nb) - la.bgemm(FL_u, f_u, nk + 1)).astype(fdt),
            nb,
        )


def _planes_update_interp(Fl: jax.Array, nb: int):
    """Dispatch for the mid-block element-plane Schur update: False =
    compiled kernel, True = interpret, None = XLA fallback.

    Applies when the slab's (knot x batch) plane flattens onto whole
    (8, 128) tiles with a power-of-two batch width (knot-id recovery in the
    kernel is a shift) and the storage dtype is float32. The small-block
    regime never reaches here (the fused schur kernels own it)."""
    interp = la._planes_interpret()
    if interp is None or nb != 1:
        return None
    n = Fl.shape[0]
    if n > 64:
        return None  # unrolled contraction length cap (compile sanity)
    N, B = Fl.shape[2], Fl.shape[3]
    if (N * B) % (8 * 128) or B & (B - 1):
        return None
    if not interp and B % 128:
        return None  # sub-lane batch widths relayout every slab (see
        # linalg._planes_args_ok); XLA fallback is faster there
    if Fl.dtype != jnp.float32 and not interp:
        return None
    return interp


def _level_update_planes_em(level, depth, Fls, Fxs, Fus, fsols, nb, interp):
    """Mid-block Schur update stage (ndlqr_UpdateShurFactor,
    nested_dissection.c:154-171) via the element-plane Pallas kernels
    (ops/planes_pallas.py): each solved separator block is broadcast over
    its group's knots once, then every upper slab updates in ONE fused
    masked pass (read multiplier + read slab + write slab) at full lane
    occupancy — no mat-last transposes, no padded reduce temps. Mutates the
    slab lists."""
    from .ops.planes_pallas import schur3_update_planes

    n = Fls[level].shape[0]
    m = Fus[level].shape[0]
    N, B = Fls[level].shape[2], Fls[level].shape[3]
    span = 1 << (level + 1)
    G = N // span
    F = N * B
    logb = B.bit_length() - 1
    flat = lambda x: x.reshape(x.shape[0], x.shape[1], F // 128, 128)
    FL_l, FL_x, FL_u = flat(Fls[level]), flat(Fxs[level]), flat(Fus[level])
    for u in range(level + 1, depth):
        fs = fsols[u]  # [n, n, G, B]
        fs_full = flat(
            jnp.broadcast_to(
                fs[:, :, :, None], (n, n, G, span, B)
            ).reshape(n, n, N, B)
        )
        ol, ox, ou = schur3_update_planes(
            FL_l, FL_x, FL_u, fs_full,
            flat(Fls[u]), flat(Fxs[u]), flat(Fus[u]),
            level=level, logb=logb, interpret=interp,
        )
        Fls[u] = ol.reshape(n, n, N, B)
        Fxs[u] = ox.reshape(n, n, N, B)
        Fus[u] = ou.reshape(m, n, N, B)


def _pallas_schur_mode(
    dtype, nb: int, N: int, b_shape, n: int = 6, options=None
) -> Optional[bool]:
    """Resolve the Pallas kernel dispatch: True = interpret, False = compiled,
    None = XLA stage. See config.pallas."""
    from .config import resolve_options

    opts = resolve_options(options)
    mode = opts.pallas
    if mode == "off":
        return None
    # The kernel unrolls ~n^3 FMA planes per upper level; past the
    # small-block regime that explodes the Mosaic program (n=36 -> 46k
    # instructions). Large blocks belong to the grid/MXU path anyway.
    if n > opts.mxu_block_threshold:
        return None
    # Applicability: one flattened batch axis, knot axis tileable (16-row
    # tiles for bf16 slabs).
    min_tk = 16 if dtype == jnp.bfloat16 else 8
    if nb != 1 or N < min_tk or N % min_tk:
        return None
    B = b_shape[0]
    if B % min(128, B):
        return None
    if mode == "interpret":
        return True
    if mode == "on":
        return False
    ok_dtype = dtype in (jnp.float32, jnp.bfloat16)
    return False if jax.default_backend() == "tpu" and ok_dtype else None


def _sep_gm(M: jax.Array, level: int) -> jax.Array:
    """Group-major gather of a dynamics array at level-``level`` separator
    knots: ``[p, q, N, B] -> [G, pq, B]`` with ``G = N / 2^{level+1}``.

    Uses the free reshape + unit-slice pattern (never a strided gather)."""
    p, q, N, B = M.shape
    span = 1 << (level + 1)
    G = N // span
    sep = M.reshape(p * q, G, span, B)[:, :, span // 2 - 1, :]
    return jnp.moveaxis(sep, 0, 1)


def _schur_pallas(A, B_dyn, level, depth, Fls, Fxs, Fus, fsols, n, m, interpret):
    """Run the fused Pallas Schur stage (ops/schur_pallas.py) in place of the
    XLA update loop. Slabs are [n, n, N, B] -> flattened [nn, N, B] views.
    Returns the next level's inner products list (or None)."""
    from .ops.schur_pallas import _tiles, schur_update_level_em

    N, B = Fls[level].shape[2], Fls[level].shape[3]
    nn, mn = n * n, m * n
    us = list(range(level + 1, depth))
    # Emit the next level's products when the knot tile covers whole
    # next-level groups (see _tiles); else the caller recomputes from slabs.
    _, _, _, gd2, _ = _tiles(level, N, B, Fls[0].dtype, 128)
    Asep = Bsep = None
    if gd2 > 0 and level + 2 <= depth:
        Asep = _sep_gm(A, level + 1)
        Bsep = _sep_gm(B_dyn, level + 1)
    ol, ox, ou, S_next = schur_update_level_em(
        Fls[level].reshape(nn, N, B),
        Fxs[level].reshape(nn, N, B),
        Fus[level].reshape(mn, N, B),
        [Fls[u].reshape(nn, N, B) for u in us],
        [Fxs[u].reshape(nn, N, B) for u in us],
        [Fus[u].reshape(mn, N, B) for u in us],
        # fsol goes group-major [G, nn, B] (see kernel block constraints).
        [jnp.moveaxis(fsols[u].reshape(nn, -1, B), 0, 1) for u in us],
        Asep,
        Bsep,
        level=level,
        n=n,
        m=m,
        interpret=interpret,
    )
    for i, u in enumerate(us):
        Fls[u] = ol[i].reshape(n, n, N, B)
        Fxs[u] = ox[i].reshape(n, n, N, B)
        Fus[u] = ou[i].reshape(m, n, N, B)
    return S_next


def _flat_path_ok(dtype, nb: int, N: int, b_shape, opts=None) -> bool:
    """Whether the flat-plane kernel suite (ops/schur_planes.py) applies:
    one flattened batch axis whose width gives every knot whole (8, 128)
    tiles. The [nn, N, B] kernels remain the fallback for narrow batches."""
    from .ops.schur_planes import flat_ok

    if opts is not None and not opts.flat_planes:
        return False
    return nb == 1 and flat_ok(N, b_shape[0], dtype)


def _flat(x: jax.Array) -> jax.Array:
    """Element-major blocks ``[p, q, N, B] -> [pq, N*B/128, 128]`` (free)."""
    p, q, N, B = x.shape
    return x.reshape(p * q, N * B // 128, 128)


def _flatv(x: jax.Array) -> jax.Array:
    """Element-major vectors ``[p, N, B] -> [p, N*B/128, 128]`` (free)."""
    p, N, B = x.shape
    return x.reshape(p, N * B // 128, 128)


def _sep_flat(M: jax.Array, level: int) -> jax.Array:
    """Dynamics at level-``level`` separator knots as flat compact planes:
    ``[p, q, N, B] -> [pq, G*B/128, 128]`` with ``G = N / 2^{level+1}``."""
    p, q, N, B = M.shape
    span = 1 << (level + 1)
    G = N // span
    sep = M.reshape(p * q, G, span, B)[:, :, span // 2 - 1, :]
    return sep.reshape(p * q, G * B // 128, 128)


def _schur_flat(A, B_dyn, level, depth, Fls, Fxs, Fus, fsols, n, m, interpret):
    """Run the flat-plane fused Schur stage (ops/schur_planes.py); mutates
    the slab lists, returns the next level's inner products (as element-
    major [n, n, G2, B] arrays) or None."""
    from .ops.schur_planes import _flat_geometry, schur_update_level_flat

    N, B = Fls[level].shape[2], Fls[level].shape[3]
    nn = n * n
    us = list(range(level + 1, depth))
    rb, kpt, _, span, _, gd2 = _flat_geometry(level, N, B)
    Asep = Bsep = None
    if gd2 > 0 and level + 2 <= depth:
        Asep = _sep_flat(A, level + 1)
        Bsep = _sep_flat(B_dyn, level + 1)
    ol, ox, ou, S_next = schur_update_level_flat(
        _flat(Fls[level]),
        _flat(Fxs[level]),
        _flat(Fus[level]),
        [_flat(Fls[u]) for u in us],
        [_flat(Fxs[u]) for u in us],
        [_flat(Fus[u]) for u in us],
        [_flat(fsols[u]) for u in us],  # [nn, G*rb, 128] compact
        Asep,
        Bsep,
        level=level,
        n=n,
        m=m,
        N=N,
        interpret=interpret,
    )
    for i, u in enumerate(us):
        Fls[u] = ol[i].reshape(n, n, N, B)
        Fxs[u] = ox[i].reshape(n, n, N, B)
        Fus[u] = ou[i].reshape(m, n, N, B)
    if S_next is None:
        return None
    G2 = N // (2 * span)  # span = 2^{level+1} from _flat_geometry
    return [S.reshape(n, n, G2, B) for S in S_next]


def _pair_prepass(A, B, level, depth, Fls, Fxs, Fus, fsols1, nb):
    """Compact pre-pass for the level-paired kernel: the level-(L+1) inner
    products ``S_{L+1}`` (ndlqr_FactorInnerProduct, nested_dissection.c:
    114-134) computed from the PRE-update slabs plus this level's solved
    separators — only the level-(L+1) separator rows (2 / 2^{L+2} of each
    slab) are gathered, so the full level-(L+1) slab pass disappears.

    Row algebra: with ``r2 = g*span2 + span1 - 1`` (the L+1 separator) and
    ``r2 + 1``, the level-L update changes only the x/u rows there (both
    rows are range starts or mid-range knots where the lambda update is
    masked and no separator overwrite lands — see keep/sep masks in
    ops/schur_pallas._update_kernel), so the post-L values are
    ``Fx' = Fx - FxL @ fsol1[even/odd group]`` etc.
    """
    span1 = 1 << (level + 1)
    span2 = 2 * span1
    nk = nb + 1
    sel2 = lambda x, pos: _sel(_gk(x, span2, nb), pos, nb)
    A_sep2 = sel2(A, span1 - 1)
    B_sep2 = sel2(B, span1 - 1)
    FxL_r2 = sel2(Fxs[level], span1 - 1)
    FuL_r2 = sel2(Fus[level], span1 - 1)
    FxL_r2p = sel2(Fxs[level], span1)
    Ss = []
    for u in range(level + 1, depth):
        f = fsols1[u]  # [n, n, G1, *b]
        f_e = _sel(_gk(f, 2, nb), 0, nb)  # even level-L groups (row r2)
        f_o = _sel(_gk(f, 2, nb), 1, nb)  # odd groups (row r2 + 1)
        Fx_r2 = sel2(Fxs[u], span1 - 1) - la.bgemm(FxL_r2, f_e, nk)
        Fu_r2 = sel2(Fus[u], span1 - 1) - la.bgemm(FuL_r2, f_e, nk)
        Fx_r2p = sel2(Fxs[u], span1) - la.bgemm(FxL_r2p, f_o, nk)
        Fl_r2p = sel2(Fls[u], span1)
        Ss.append(
            la.bgemm(A_sep2, Fx_r2, nk)
            + la.bgemm(B_sep2, Fu_r2, nk)
            - Fx_r2p
            - Fl_r2p
        )
    return Ss


def _schur_pallas_pair(
    A, B_dyn, level, depth, Fls, Fxs, Fus, fsols1, Sbar2, fsols2, n, m,
    interpret,
):
    """Run the two-level fused Schur kernel (schur_update_pair_em) covering
    levels ``level`` and ``level + 1`` in one slab pass; mutates the slab
    lists, returns the level-(L+2) products list (or None)."""
    from .ops.schur_pallas import _tiles_pair, schur_update_pair_em

    N, B = Fls[level].shape[2], Fls[level].shape[3]
    nn, mn = n * n, m * n
    us = list(range(level + 1, depth))
    _, _, _, _, gd3, _ = _tiles_pair(
        level, N, B, Fls[0].dtype, 128, 2 * nn + mn, len(us)
    )
    Asep = Bsep = None
    if gd3 > 0 and level + 2 <= depth - 1:
        Asep = _sep_gm(A, level + 2)
        Bsep = _sep_gm(B_dyn, level + 2)
    gm = lambda x: jnp.moveaxis(x.reshape(nn, -1, B), 0, 1)
    ol, ox, ou, S_next = schur_update_pair_em(
        Fls[level].reshape(nn, N, B),
        Fxs[level].reshape(nn, N, B),
        Fus[level].reshape(mn, N, B),
        [Fls[u].reshape(nn, N, B) for u in us],
        [Fxs[u].reshape(nn, N, B) for u in us],
        [Fus[u].reshape(mn, N, B) for u in us],
        [gm(fsols1[u]) for u in us],
        gm(Sbar2),
        [gm(fsols2[u]) for u in us[1:]],
        Asep,
        Bsep,
        level=level,
        n=n,
        m=m,
        interpret=interpret,
    )
    for i, u in enumerate(us):
        Fls[u] = ol[i].reshape(n, n, N, B)
        Fxs[u] = ox[i].reshape(n, n, N, B)
        Fus[u] = ou[i].reshape(m, n, N, B)
    return S_next


def _sweep_pair_em(
    A, B, level, depth, Fls, Fxs, Fus, n, m, nb, ex, options, mode
):
    """TWO levels of the factorization sweep (ref solve.c:68-134, two
    iterations) with a single slab read+write: compact XLA stages for both
    levels' Cholesky factors and separator solves, then the fused pair
    kernel. Returns ``(Lc1, Lc2, ex_next)``."""
    Ss = _level_products_em(A, B, level, depth, Fls, Fxs, Fus, nb, ex, n)
    Lc1 = la.bcholesky(Ss[0], nb + 1)
    if ex is None:
        _level_writeback_em(Fls, level, Ss[0], nb)
    fsols1 = _level_cholsolve_em(Lc1, Ss, level, nb)
    S2 = _pair_prepass(A, B, level, depth, Fls, Fxs, Fus, fsols1, nb)
    Lc2 = la.bcholesky(S2[0], nb + 1)
    fsols2 = {
        level + 2 + i: s
        for i, s in enumerate(_cholsolve_stacked(Lc2, S2[1:], nb))
    }
    ex_next = _schur_pallas_pair(
        A, B, level, depth, Fls, Fxs, Fus, fsols1, S2[0], fsols2, n, m, mode
    )
    return Lc1, Lc2, ex_next


def _rhs_level_em(A, B, level, Fl, Fx, Fu, Lc, zy, zx, zu, nb, options=None):
    """One level of the RHS sweep (ref solve.c:137-182), element-major.

    Vectors are ``[n|m, N, *b]``; returns updated ``(zy, zx, zu)``.
    """
    span = 1 << (level + 1)
    mid = (1 << level) - 1
    N = zy.shape[1]
    G = N // span
    nk = nb + 1

    A_sep = _sel(_gk(A, span, nb), mid, nb)
    B_sep = _sel(_gk(B, span, nb), mid, nb)
    gy = _gk(zy, span, nb)
    gx = _gk(zx, span, nb)
    gu = _gk(zu, span, nb)

    znew = (
        la.bgemv(A_sep, _sel(gx, mid, nb), nk)
        + la.bgemv(B_sep, _sel(gu, mid, nb), nk)
        - _sel(gx, mid + 1, nb)
        - _sel(gy, mid + 1, nb)
    )
    zbar = la.bcho_solve_vec(Lc, znew, nk)  # [n, G, *b]

    n, m = zy.shape[0], zu.shape[0]
    mode = _pallas_schur_mode(Fl.dtype, nb, N, zy.shape[2:], n, options)
    if mode is not None and _flat_path_ok(
            Fl.dtype, nb, N, zy.shape[2:], options
    ):
        from .ops.schur_planes import rhs_update_level_flat

        B_ = zy.shape[2]
        oy, ox_, ou_ = rhs_update_level_flat(
            _flat(Fl),
            _flat(Fx),
            _flat(Fu),
            _flatv(zy), _flatv(zx), _flatv(zu),
            zbar.reshape(n, G * B_ // 128, 128),
            level=level, n=n, m=m, N=N, interpret=mode,
        )
        return (
            oy.reshape(n, N, B_),
            ox_.reshape(n, N, B_),
            ou_.reshape(m, N, B_),
        )
    if mode is not None:
        # Fused slab application: one HBM pass over the level's factor slab
        # (ops/schur_pallas.rhs_update_level_em); the compact separator
        # solve above stays XLA.
        from .ops.schur_pallas import rhs_update_level_em

        B_ = zy.shape[2]
        return rhs_update_level_em(
            Fl.reshape(n * n, N, B_),
            Fx.reshape(n * n, N, B_),
            Fu.reshape(m * n, N, B_),
            zy, zx, zu,
            jnp.moveaxis(zbar, 0, 1),  # [G, n, B] group-major
            level=level, n=n, m=m, interpret=mode,
        )

    interp_mid = _planes_update_interp(Fl, nb)
    if interp_mid is not None:
        # Mid-block: the same fused planes kernel as the factor sweep,
        # with the z vectors as width-1 block columns.
        from .ops.planes_pallas import schur3_update_planes

        B_ = zy.shape[2]
        F = N * B_
        logb = B_.bit_length() - 1
        flat = lambda x: x.reshape(x.shape[0], x.shape[1], F // 128, 128)
        flatv = lambda x: x.reshape(x.shape[0], 1, F // 128, 128)
        zb_full = jnp.broadcast_to(
            zbar[:, :, None], (n, G, span, B_)
        ).reshape(n, N, B_)
        oy, ox_, ou_ = schur3_update_planes(
            flat(Fl), flat(Fx), flat(Fu), flatv(zb_full),
            flatv(zy), flatv(zx), flatv(zu),
            level=level, logb=logb, interpret=interp_mid,
        )
        return (
            oy.reshape(n, N, B_),
            ox_.reshape(n, N, B_),
            ou_.reshape(m, N, B_),
        )

    sepw = np.zeros((G, span), dtype=bool)
    sepw[:, mid + 1] = True
    ms = _kmask(sepw, 1, nb)
    keep = _kmask(_lambda_mask(N, span, mid + 1), 1, nb)
    f_b = jnp.expand_dims(zbar, -(nb + 1))  # [n, G, 1, *b]
    upd_y = la.bgemv(_gk(Fl, span, nb), f_b, nk + 1)
    upd_x = la.bgemv(_gk(Fx, span, nb), f_b, nk + 1)
    upd_u = la.bgemv(_gk(Fu, span, nb), f_b, nk + 1)
    zy = _ugk(jnp.where(ms, f_b, gy - jnp.where(keep, upd_y, 0.0)), nb)
    zx = _ugk(gx - upd_x, nb)
    zu = _ugk(gu - upd_u, nb)
    return zy, zx, zu


def _leaf_products0(pbl: LQRProblem, t: TreeTables, n: int, m: int, nb: int):
    """Level-0 inner products computed directly from the problem data on
    compact even/odd-knot gathers — no leaf slabs are materialized.

    ``S_{0,u} = A_sep @ Fx_u[even] + B_sep @ Fu_u[even] - Fx_u[odd]``
    (ndlqr_FactorInnerProduct at level 0, nested_dissection.c:114-134; the
    lambda term vanishes because the only nonzero leaf lambda block sits at
    knot 0, an even knot). All gathers use reshape + unit-slice (free).
    Returns ``(A, B, qinv, rinv, [S_u])`` in element-major layout.
    """
    N, depth = pbl.A.shape[0], t.depth
    nk = nb + 1
    A = _em(pbl.A)  # [n, n, N, *b]
    Bd = _em(pbl.B)
    At = jnp.swapaxes(A, 0, 1)
    Bt = jnp.swapaxes(Bd, 0, 1)
    qinv = 1.0 / _emv(pbl.Qdiag)  # [n, N, *b]
    rinv = 1.0 / _emv(pbl.Rdiag)
    QiAt = At * qinv[:, None]
    RiBt = Bt * rinv[:, None]
    own, prev = _leaf_masks(t.levels, N, depth)
    knot0 = np.arange(N) == 0

    par = lambda x, p: _sel(_gk(x, 2, nb), p, nb)  # even (0) / odd (1) knots
    eye = jnp.eye(n, dtype=A.dtype).reshape((n, n, 1) + (1,) * nb)
    qinv_e, qinv_o = par(qinv, 0), par(qinv, 1)
    A_sep, B_sep = par(A, 0), par(Bd, 0)
    QiAt_e, QiAt_o = par(QiAt, 0), par(QiAt, 1)
    RiBt_e = par(RiBt, 0)

    Ss = []
    for u in range(depth):
        def fx(parity, QiAt_p, qinv_p):
            mo = _kmask(own[u][parity::2], 2, nb)
            mp = _kmask(prev[u][parity::2], 2, nb)
            return jnp.where(mo, QiAt_p, 0.0) - jnp.where(
                mp, eye * qinv_p[None], 0.0
            )

        ownu = own[u] | knot0 if u == 0 else own[u]
        Fue = jnp.where(_kmask(ownu[0::2], 2, nb), RiBt_e, 0.0)
        S = (
            la.bgemm(A_sep, fx(0, QiAt_e, qinv_e), nk)
            + la.bgemm(B_sep, Fue, nk)
            - fx(1, QiAt_o, qinv_o)
        )
        Ss.append(S)
    return A, Bd, qinv, rinv, Ss


def _gm(x: jax.Array) -> jax.Array:
    """Element-major block array ``[p, q, G, B] -> [G, pq, B]`` group-major."""
    p, q, G, B = x.shape
    return jnp.moveaxis(x.reshape(p * q, G, B), 0, 1)


def _num_batch_axes(prob: LQRProblem) -> int:
    return prob.A.ndim - 3


def factorize_em(
    prob: LQRProblem, tables: Optional[TreeTables] = None, options=None
) -> Tuple[EmFactorization, Tuple]:
    """Leaf solves + level sweep (ref solve.c:50-134), element-major.

    Accepts leading-batch problems like :func:`rslqr_tpu.rslqr.factorize`.
    Returns the factorization and the leaf-solved element-major RHS
    ``(zy, zx, zu)`` (each ``[n|m, N, *b]``).
    """
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        return _factorize_em_impl(prob, tables, opts)


def _factorize_em_impl(
    prob: LQRProblem, tables: Optional[TreeTables], opts
) -> Tuple[EmFactorization, Tuple]:
    nb = _num_batch_axes(prob)
    pbl = _to_batch_last(prob, nb)
    t = tables or build_tree_tables(pbl.A.shape[0])
    n, m = pbl.A.shape[1], pbl.B.shape[2]
    N = pbl.A.shape[0]
    fdt = jnp.dtype(opts.factor_dtype) if opts.factor_dtype else pbl.A.dtype
    mode = _pallas_schur_mode(fdt, nb, N, pbl.A.shape[3:], n, opts)

    if mode is not None and t.depth >= 2:
        # Fused leaf + level-0 path: level-0 products from compact gathers,
        # then ONE kernel writes every slab in its post-level-0 state
        # (ops/schur_pallas.leaf_schur_level0_em) and emits the level-1
        # products. Replaces the separate leaf pass + its slab re-read.
        from .ops.schur_pallas import leaf_schur_level0_em

        nk = nb + 1
        A, B, qinv, rinv, Ss = _leaf_products0(pbl, t, n, m, nb)
        Lc0 = la.bcholesky(Ss[0], nk)
        fsols0 = _cholsolve_stacked(Lc0, Ss[1:], nb)
        Bb = A.shape[3]
        use_flat = _flat_path_ok(fdt, nb, N, pbl.A.shape[3:], opts)
        if use_flat:
            from .ops.schur_planes import leaf_schur_level0_flat

            Fls, Fxs, Fus, ex = leaf_schur_level0_flat(
                _flat(A),
                _flat(B),
                _flatv(qinv),
                _flatv(rinv),
                _flat(Ss[0]),
                [_flat(f) for f in fsols0],
                _sep_flat(A, 1),
                _sep_flat(B, 1),
                depth=t.depth,
                n=n,
                m=m,
                N=N,
                interpret=mode,
                factor_dtype=opts.factor_dtype,
            )
            if ex is not None:
                ex = [S.reshape(n, n, N // 4, Bb) for S in ex]
        else:
            Fls, Fxs, Fus, ex = leaf_schur_level0_em(
                A.reshape(n * n, N, Bb),
                B.reshape(n * m, N, Bb),
                qinv,
                rinv,
                _gm(Ss[0]),
                [_gm(f) for f in fsols0],
                _sep_gm(A, 1),
                _sep_gm(B, 1),
                depth=t.depth,
                n=n,
                m=m,
                interpret=mode,
                factor_dtype=opts.factor_dtype,
            )
        Fls = [x.reshape(n, n, N, Bb) for x in Fls]
        Fxs = [x.reshape(n, n, N, Bb) for x in Fxs]
        Fus = [x.reshape(m, n, N, Bb) for x in Fus]
        zy, zx, zu = _leaf_z(pbl, nb)
        chols = [Lc0]
        start_level = 1
    else:
        Fls, Fxs, Fus, A, B, zy, zx, zu = _leaf_em(
            pbl, t.levels, t.depth, nb, opts.factor_dtype
        )
        chols = []
        ex = None
        start_level = 0
    level = start_level
    while level < t.depth:
        # Level pairing: two sweep levels per slab pass (the single biggest
        # HBM saving after the fused leaf — see _sweep_pair_em). Applicable
        # whenever the pair kernel runs and level+1 still has upper levels
        # to update. The flat-plane path skips it: its kernels run ~2x the
        # rate of the [nn, N, B] suite and pairing bought only ~4% there
        # (probes/probe_pair_ab.py).
        if (
            mode is not None and level <= t.depth - 3 and opts.level_pairing
            and not _flat_path_ok(fdt, nb, N, pbl.A.shape[3:], opts)
        ):
            Lc1, Lc2, ex = _sweep_pair_em(
                A, B, level, t.depth, Fls, Fxs, Fus, n, m, nb, ex, opts, mode
            )
            chols.extend([Lc1, Lc2])
            level += 2
        else:
            Lc, ex = _sweep_level_em(
                A, B, level, t.depth, Fls, Fxs, Fus, n, m, nb, ex, opts
            )
            chols.append(Lc)
            level += 1
    fact = EmFactorization(
        Fls=tuple(Fls), Fxs=tuple(Fxs), Fus=tuple(Fus), chols=tuple(chols),
        nbatch=nb,
    )
    return fact, (zy, zx, zu)


def solve_rhs_em(
    prob: LQRProblem,
    fact: EmFactorization,
    rhs: Tuple,
    tables: Optional[TreeTables] = None,
    options=None,
) -> RsLqrSolution:
    """Cached-factorization RHS solve (ref solve.c:137-182), element-major.

    ``rhs`` is the leaf-solved element-major RHS as returned by
    :func:`factorize_em` (or :func:`leaf_rhs_em` for fresh right-hand
    sides — the multi-RHS mode the reference hints at, nddata.h:72-75).
    """
    from .config import resolve_options

    opts = resolve_options(options)
    with la.block_threshold(opts.mxu_block_threshold), \
            la.pallas_ctx(opts.pallas):
        return _solve_rhs_em_impl(prob, fact, rhs, tables, opts)


def _solve_rhs_em_impl(prob, fact, rhs, tables, options) -> RsLqrSolution:
    nb = fact.nbatch
    pbl = _to_batch_last(prob, _num_batch_axes(prob))
    t = tables or build_tree_tables(pbl.A.shape[0])
    A, B = _em(pbl.A), _em(pbl.B)
    zy, zx, zu = rhs
    for level in range(t.depth):
        zy, zx, zu = _rhs_level_em(
            A, B, level, fact.Fls[level], fact.Fxs[level], fact.Fus[level],
            fact.chols[level], zy, zx, zu, nb, options,
        )
    Y, X, U = _emv_bl(zy), _emv_bl(zx), _emv_bl(zu)
    return RsLqrSolution(
        Y=_bf(Y, nb), X=_bf(X, nb), U=_bf(U[:-1], nb), fact=fact
    )


def leaf_rhs_em(prob: LQRProblem) -> Tuple:
    """Leaf-solve a fresh RHS into element-major planes (multi-RHS mode /
    iterative refinement; the z-vector half of ndlqr_SolveLeaf,
    nested_dissection.c:42-90)."""
    nb = _num_batch_axes(prob)
    pbl = _to_batch_last(prob, nb)
    t = build_tree_tables(pbl.A.shape[0])
    *_, zy, zx, zu = _leaf_em(pbl, t.levels, t.depth, nb)
    return zy, zx, zu


def em_rhs_from_bl(rhs: Tuple) -> Tuple:
    """Convert a batch-last leaf-solved RHS (rslqr layout) to element-major."""
    zy, zx, zu = rhs
    return _emv(zy), _emv(zx), _emv(zu)


def solve_em(
    prob: LQRProblem, tables: Optional[TreeTables] = None, options=None
) -> RsLqrSolution:
    """Full rsLQR solve, element-major (ref ndlqr_Solve, solve.c:38-190)."""
    t = tables or build_tree_tables(prob.A.shape[-3])
    fact, rhs = factorize_em(prob, t, options=options)
    return solve_rhs_em(prob, fact, rhs, t, options=options)


def solve_kkt_em(prob: LQRProblem, options=None) -> jax.Array:
    """Solve and return the flat KKT vector(s) ``[*b, nvars]``."""
    sol = solve_em(prob, options=options)
    return pack_solution(sol.Y, sol.X, sol.U)

"""Pallas kernel tests (interpret mode on CPU, per SURVEY §7 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rslqr_tpu as rt
from rslqr_tpu.config import config
from rslqr_tpu.ops.schur_pallas import (
    leaf_schur_level0_em,
    schur_update_level_em,
)


def _reference_update(FLl, FLx, FLu, Fls, Fxs, Fus, fsol, level, n, m):
    """Straightforward numpy replay of the fused Schur-update semantics
    (update + calc_lambda mask + separator write-back), element-major."""
    U = len(Fls)
    N = FLl.shape[1]
    span = 1 << (level + 1)
    half = 1 << level
    ol = [x.copy() for x in Fls]
    ox = [x.copy() for x in Fxs]
    ou = [x.copy() for x in Fus]
    for u in range(U):
        for k in range(N):
            g = k // span
            f = fsol[u][g].reshape(n, n, -1)
            FL = FLl[:, k].reshape(n, n, -1)
            if k % span == half:  # sep+1: write the solved separator block
                ol[u][:, k] = fsol[u][g]
            elif (k % half != 0) or (k == 0):  # calc_lambda
                upd = np.einsum("ijb,jkb->ikb", FL, f)
                ol[u][:, k] -= upd.reshape(n * n, -1)
            FX = FLx[:, k].reshape(n, n, -1)
            ox[u][:, k] -= np.einsum("ijb,jkb->ikb", FX, f).reshape(n * n, -1)
            FU = FLu[:, k].reshape(m, n, -1)
            ou[u][:, k] -= np.einsum("ijb,jkb->ikb", FU, f).reshape(m * n, -1)
    return ol, ox, ou


def _reference_products(ol, ox, ou, A_em, B_em, level, n, m):
    """Next-level inner products from the (pre-fold) updated slabs:
    S = A_sep @ Fx[sep] + B_sep @ Fu[sep] - Fx[sep+1] - Fl[sep+1]."""
    N = ol[0].shape[1]
    span2 = 2 << (level + 1)
    sel = np.arange(span2 // 2 - 1, N, span2)
    Ss = []
    for u in range(len(ol)):
        xs = ox[u][:, sel].reshape(n, n, len(sel), -1)
        us_ = ou[u][:, sel].reshape(m, n, len(sel), -1)
        xn = ox[u][:, sel + 1].reshape(n, n, len(sel), -1)
        ln = ol[u][:, sel + 1].reshape(n, n, len(sel), -1)
        Ag = A_em[:, sel].reshape(n, n, len(sel), -1)
        Bg = B_em[:, sel].reshape(n, m, len(sel), -1)
        S = (
            np.einsum("ijgb,jkgb->ikgb", Ag, xs)
            + np.einsum("ijgb,jkgb->ikgb", Bg, us_)
            - xn
            - ln
        )
        Ss.append(np.moveaxis(S.reshape(n * n, len(sel), -1), 0, 1))
    return sel, Ss


@pytest.mark.parametrize("level,N", [(0, 16), (1, 16), (2, 16), (3, 32), (4, 64)])
def test_schur_kernel_matches_reference(level, N):
    """Covers gd = 4, 2, 1 and span > tile (levels 3, 4 with tk=8)."""
    n, m, B = 6, 3, 8
    depth = {16: 4, 32: 5, 64: 6}[N]
    U = depth - level - 1
    G = N // (1 << (level + 1))
    rng = np.random.default_rng(level)
    f32 = np.float32
    FLl = rng.normal(size=(n * n, N, B)).astype(f32)
    FLx = rng.normal(size=(n * n, N, B)).astype(f32)
    FLu = rng.normal(size=(m * n, N, B)).astype(f32)
    Fls = [rng.normal(size=(n * n, N, B)).astype(f32) for _ in range(U)]
    Fxs = [rng.normal(size=(n * n, N, B)).astype(f32) for _ in range(U)]
    Fus = [rng.normal(size=(m * n, N, B)).astype(f32) for _ in range(U)]
    fsol = [rng.normal(size=(G, n * n, B)).astype(f32) for _ in range(U)]
    A_em = rng.normal(size=(n * n, N, B)).astype(f32)
    B_em = rng.normal(size=(n * m, N, B)).astype(f32)

    # Group-major next-level separator dynamics for the S emission.
    span2 = 2 << (level + 1)
    emit = span2 <= min(max(2 << level, 8), 16, N) and N >= span2
    sel = np.arange(span2 // 2 - 1, N, span2)
    Asep = jnp.asarray(np.moveaxis(A_em[:, sel], 0, 1)) if emit else None
    Bsep = jnp.asarray(np.moveaxis(B_em[:, sel], 0, 1)) if emit else None

    ol, ox, ou, S_next = schur_update_level_em(
        jnp.asarray(FLl), jnp.asarray(FLx), jnp.asarray(FLu),
        [jnp.asarray(x) for x in Fls], [jnp.asarray(x) for x in Fxs],
        [jnp.asarray(x) for x in Fus], [jnp.asarray(x) for x in fsol],
        Asep, Bsep,
        level=level, n=n, m=m, interpret=True,
    )
    rl, rx, ru = _reference_update(
        FLl, FLx, FLu, Fls, Fxs, Fus, fsol, level, n, m
    )
    if emit:
        sel2, Sref = _reference_products(rl, rx, ru, A_em, B_em, level, n, m)
        # The write-back fold: the next level's own slab gets its Sbar
        # (S_next[0]) at the next level's sep+1 rows.
        rl[0][:, sel2 + 1] = np.moveaxis(Sref[0], 0, 1)
        assert S_next is not None
        for u in range(U):
            np.testing.assert_allclose(
                np.asarray(S_next[u]), Sref[u], atol=1e-4
            )
    else:
        assert S_next is None
    for u in range(U):
        np.testing.assert_allclose(np.asarray(ol[u]), rl[u], atol=1e-4)
        np.testing.assert_allclose(np.asarray(ox[u]), rx[u], atol=1e-4)
        np.testing.assert_allclose(np.asarray(ou[u]), ru[u], atol=1e-4)


def test_leaf_kernel_matches_xla_leaf(lqr_prob_path):
    """leaf_schur_level0_em == XLA leaf pass + XLA level-0 sweep, and the
    emitted level-1 products match the slab-computed ones."""
    from rslqr_tpu import rslqr_em
    from rslqr_tpu import linalg as la

    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    batch = rt.batch_problems(prob, keys)
    nb = 1
    pbl = rslqr_em._to_batch_last(batch, nb)
    from rslqr_tpu.tree import build_tree_tables

    t = build_tree_tables(pbl.A.shape[0])
    n, m = pbl.A.shape[1], pbl.B.shape[2]
    N, B = pbl.A.shape[0], pbl.A.shape[3]

    # XLA reference: leaf slabs + level-0 sweep (pallas off).
    Fls, Fxs, Fus, A, Bd, *_ = rslqr_em._leaf_em(pbl, t.levels, t.depth, nb)
    Fls_r, Fxs_r, Fus_r = list(Fls), list(Fxs), list(Fus)
    from rslqr_tpu.config import SolveOptions

    off = SolveOptions(pallas="off")
    Lc0_r, _ = rslqr_em._sweep_level_em(
        A, Bd, 0, t.depth, Fls_r, Fxs_r, Fus_r, n, m, nb, None, off
    )

    # Kernel path (interpret mode).
    A2, B2, qinv, rinv, Ss = rslqr_em._leaf_products0(pbl, t, n, m, nb)
    Lc0 = la.bcholesky(Ss[0], nb + 1)
    fsols0 = [la.bcho_solve(Lc0, S, nb + 1) for S in Ss[1:]]
    ol, ox, ou, S1 = leaf_schur_level0_em(
        A2.reshape(n * n, N, B), B2.reshape(n * m, N, B), qinv, rinv,
        rslqr_em._gm(Ss[0]), [rslqr_em._gm(f) for f in fsols0],
        rslqr_em._sep_gm(A2, 1), rslqr_em._sep_gm(B2, 1),
        depth=t.depth, n=n, m=m, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(Lc0), np.asarray(Lc0_r), atol=1e-10
    )
    # Compare slabs: the kernel folds level-1's Sbar write-back into slab 1,
    # so replay that fold on the XLA reference slabs before comparing.
    sel = np.arange(1, N, 4)  # level-1 separator knots
    for u in range(t.depth):
        gl = np.asarray(ol[u]).reshape(n * n, N, B)
        gx = np.asarray(ox[u]).reshape(n * n, N, B)
        gu = np.asarray(ou[u]).reshape(m * n, N, B)
        rl = np.asarray(Fls_r[u]).reshape(n * n, N, B)
        rx_ = np.asarray(Fxs_r[u]).reshape(n * n, N, B)
        ru_ = np.asarray(Fus_r[u]).reshape(m * n, N, B)
        if u == 1:
            # Replay the fold on the reference: Sbar_1 into rows sel+1.
            S1r = (
                np.einsum(
                    "ijgb,jkgb->ikgb",
                    np.asarray(A2)[:, :, sel],
                    rx_[:, sel].reshape(n, n, len(sel), B),
                )
                + np.einsum(
                    "ijgb,jkgb->ikgb",
                    np.asarray(B2)[:, :, sel],
                    ru_[:, sel].reshape(m, n, len(sel), B),
                )
                - rx_[:, sel + 1].reshape(n, n, len(sel), B)
                - rl[:, sel + 1].reshape(n, n, len(sel), B)
            )
            rl = rl.copy()
            rl[:, sel + 1] = S1r.reshape(n * n, len(sel), B)
        np.testing.assert_allclose(gl, rl, atol=1e-8, err_msg=f"Fl[{u}]")
        np.testing.assert_allclose(gx, rx_, atol=1e-8, err_msg=f"Fx[{u}]")
        np.testing.assert_allclose(gu, ru_, atol=1e-8, err_msg=f"Fu[{u}]")


@pytest.fixture
def pallas_interpret():
    old = config.pallas
    config.pallas = "interpret"
    yield
    config.pallas = old


def test_em_solve_with_pallas_schur(pallas_interpret, lqr_prob_path):
    """The wired production path: element-major solve with the Pallas
    leaf/Schur stages equals the XLA stage bit-for-bit-ish and the golden
    solution."""
    from rslqr_tpu import rslqr_em

    prob, gold = rt.read_lqr_problem_json(lqr_prob_path)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    batch = rt.batch_problems(prob, keys)
    got = jax.jit(rslqr_em.solve_kkt_em)(batch)
    config.pallas = "off"
    want = jax.jit(rslqr_em.solve_kkt_em)(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)

    # Single problem falls back to XLA (nb == 0) but must still be correct.
    config.pallas = "interpret"
    vec = jax.jit(rslqr_em.solve_kkt_em)(prob)
    assert np.abs(np.asarray(vec) - gold).max() < 1e-6


def test_em_solve_pallas_n64_batch16(pallas_interpret):
    """Deeper tree (N=64): kernel-emitted products at levels 0-2, XLA
    products at 3+, against the XLA-only path."""
    from rslqr_tpu import rslqr_em

    prob = rt.double_integrator_problem(64, dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    batch = rt.batch_problems(prob, keys)
    got = jax.jit(rslqr_em.solve_kkt_em)(batch)
    config.pallas = "off"
    want = jax.jit(rslqr_em.solve_kkt_em)(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


@pytest.mark.parametrize("level", [0, 1, 3, 5])
def test_rhs_kernel_matches_xla(level):
    """rhs_update_level_em vs the XLA update branch on random data."""
    from rslqr_tpu import rslqr_em
    from rslqr_tpu.config import SolveOptions

    n, m, N, B = 6, 3, 64, 8
    rng = np.random.default_rng(level)
    f = lambda *s: jnp.asarray(rng.standard_normal(s))
    A = f(n, n, N, B)
    Bd = f(n, m, N, B)
    Fl, Fx = f(n, n, N, B), f(n, n, N, B)
    Fu = f(m, n, N, B)
    # SPD-ish Cholesky factor blocks (lower triangular, positive diagonal).
    G = N // (1 << (level + 1))
    Lc = jnp.tril(jnp.moveaxis(f(G, B, n, n), (0, 1), (2, 3))) + 2.0 * jnp.eye(
        n
    ).reshape(n, n, 1, 1)
    zy, zx = f(n, N, B), f(n, N, B)
    zu = f(m, N, B)

    out_k = rslqr_em._rhs_level_em(
        A, Bd, level, Fl, Fx, Fu, Lc, zy, zx, zu, 1,
        SolveOptions(pallas="interpret"),
    )
    out_x = rslqr_em._rhs_level_em(
        A, Bd, level, Fl, Fx, Fu, Lc, zy, zx, zu, 1, SolveOptions(pallas="off")
    )
    for got, want, name in zip(out_k, out_x, "yxu"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-10, err_msg=f"z{name}"
        )

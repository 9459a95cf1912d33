"""Pallas kernel tests (interpret mode on CPU, per SURVEY §7 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rslqr_tpu as rt
from rslqr_tpu.config import config
from rslqr_tpu.ops.schur_pallas import schur_update_level_em


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

    ol, ox, ou, ex = schur_update_level_em(
        jnp.asarray(FLl), jnp.asarray(FLx), jnp.asarray(FLu),
        [jnp.asarray(x) for x in Fls], [jnp.asarray(x) for x in Fxs],
        [jnp.asarray(x) for x in Fus], [jnp.asarray(x) for x in fsol],
        level=level, n=n, m=m, interpret=True,
    )
    rl, rx, ru = _reference_update(
        FLl, FLx, FLu, Fls, Fxs, Fus, fsol, level, n, m
    )
    for u in range(U):
        np.testing.assert_allclose(np.asarray(ol[u]), rl[u], atol=1e-4)
        np.testing.assert_allclose(np.asarray(ox[u]), rx[u], atol=1e-4)
        np.testing.assert_allclose(np.asarray(ou[u]), ru[u], atol=1e-4)
    # Next-level separator extracts (when the tile covers whole groups).
    span2 = 2 << (level + 1)
    if ex is not None:
        xm, xn, ln, um = ex
        sel = np.arange(span2 // 2 - 1, N, span2)  # next level's separators
        for u in range(U):
            np.testing.assert_allclose(
                np.asarray(xm[u]), np.moveaxis(rx[u][:, sel], 1, 0), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(xn[u]), np.moveaxis(rx[u][:, sel + 1], 1, 0), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(ln[u]), np.moveaxis(rl[u][:, sel + 1], 1, 0), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(um[u]), np.moveaxis(ru[u][:, sel], 1, 0), atol=1e-4
            )


@pytest.fixture
def pallas_interpret():
    old = config.pallas
    config.pallas = "interpret"
    yield
    config.pallas = old


def test_em_solve_with_pallas_schur(pallas_interpret, lqr_prob_path):
    """The wired production path: element-major solve with the Pallas Schur
    stage equals the XLA stage bit-for-bit-ish and the golden solution."""
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

"""Batched block linear algebra tests (the reference's linalg_custom_test.c
role), covering both the small-block unrolled path and the large-block MXU
path across the dispatch threshold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu import linalg as la


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float64)


@pytest.mark.parametrize("n", [3, 6, 12, 36])
@pytest.mark.parametrize("nbatch", [0, 1])
def test_bgemm(n, nbatch):
    key = jax.random.PRNGKey(n)
    b = (5,) * nbatch
    A = _rand(key, (4, n, n) + b)
    B = _rand(jax.random.fold_in(key, 1), (4, n, n - 1) + b)
    out = la.bgemm(A, B, nbatch)
    ref = np.einsum("gij...,gjk...->gik...", np.asarray(A), np.asarray(B))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-10)


@pytest.mark.parametrize("n", [2, 6, 36])
def test_bgemm_broadcast_leading(n):
    key = jax.random.PRNGKey(n)
    A = _rand(key, (1, 4, n, n, 3))
    B = _rand(jax.random.fold_in(key, 1), (2, 4, n, n, 3))
    out = la.bgemm(A, B, 1)
    assert out.shape == (2, 4, n, n, 3)
    ref = np.einsum("ugijb,ugjkb->ugikb", np.broadcast_to(np.asarray(A), (2, 4, n, n, 3)), np.asarray(B))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-10)


@pytest.mark.parametrize("n", [2, 6, 36])
@pytest.mark.parametrize("nbatch", [0, 1])
def test_bcholesky_and_solve(n, nbatch):
    key = jax.random.PRNGKey(n + 100)
    b = (4,) * nbatch
    M = _rand(key, (3, n, n) + b)
    # SPD: A = M M' + n I, built in mat-first layout per slice
    A = la.bgemm(M, la.transpose_block(M, nbatch), nbatch)
    eye = jnp.eye(n).reshape((1, n, n) + (1,) * nbatch)
    A = A + n * eye
    L = la.bcholesky(A, nbatch)
    # L L' == A
    rec = la.bgemm(L, la.transpose_block(L, nbatch), nbatch)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(A), atol=1e-8)
    # cho_solve round trip
    X = _rand(jax.random.fold_in(key, 2), (3, n, 2) + b)
    B = la.bgemm(A, X, nbatch)
    Xs = la.bcho_solve(L, B, nbatch)
    np.testing.assert_allclose(np.asarray(Xs), np.asarray(X), atol=1e-8)


@pytest.mark.parametrize("n", [2, 6, 36])
@pytest.mark.parametrize("nbatch", [0, 1])
def test_bsolve_general(n, nbatch):
    key = jax.random.PRNGKey(n + 200)
    b = (4,) * nbatch
    A = _rand(key, (3, n, n) + b) + 2 * n * jnp.eye(n).reshape(
        (1, n, n) + (1,) * nbatch
    )
    X = _rand(jax.random.fold_in(key, 1), (3, n, 2) + b)
    B = la.bgemm(A, X, nbatch)
    Xs = la.bsolve(A, B, nbatch)
    np.testing.assert_allclose(np.asarray(Xs), np.asarray(X), atol=1e-8)


def test_bsolve_needs_pivoting():
    # Zero in the (0,0) position forces a row swap in the small-block path.
    A = jnp.array([[0.0, 1.0], [1.0, 0.0]])[..., None]
    X = jnp.array([[2.0], [3.0]])[..., None]
    B = la.bgemm(A, X, 1)
    Xs = la.bsolve(A, B, 1)
    np.testing.assert_allclose(np.asarray(Xs), np.asarray(X), atol=1e-12)


@pytest.mark.parametrize("nbatch", [0, 1])
def test_bgemv(nbatch):
    key = jax.random.PRNGKey(9)
    b = (7,) * nbatch
    A = _rand(key, (3, 4, 5) + b)
    x = _rand(jax.random.fold_in(key, 1), (3, 5) + b)
    out = la.bgemv(A, x, nbatch)
    ref = np.einsum("gij...,gj...->gi...", np.asarray(A), np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-10)


@pytest.mark.parametrize("n", [2, 6])
@pytest.mark.parametrize("nbatch", [0, 1])
def test_blu_factor_solve(n, nbatch):
    key = jax.random.PRNGKey(n + 300)
    b = (4,) * nbatch
    A = _rand(key, (3, n, n) + b) + 2 * n * jnp.eye(n).reshape(
        (1, n, n) + (1,) * nbatch
    )
    LU, dinv = la.blu_factor(A, nbatch)
    # Reconstruct A = L @ U from the packed factorization.
    LUn = np.asarray(LU)
    Lm = np.tril(np.moveaxis(LUn, [-2 - nbatch, -1 - nbatch], [-2, -1]), -1)
    Lm += np.eye(n)
    Um = np.triu(np.moveaxis(LUn, [-2 - nbatch, -1 - nbatch], [-2, -1]))
    rec = np.moveaxis(Lm @ Um, [-2, -1], [-2 - nbatch, -1 - nbatch])
    np.testing.assert_allclose(rec, np.asarray(A), atol=1e-8)
    # Solve round-trips, both A X = B and A' X = B.
    X = _rand(jax.random.fold_in(key, 1), (3, n, 2) + b)
    B = la.bgemm(A, X, nbatch)
    np.testing.assert_allclose(
        np.asarray(la.blu_solve(LU, dinv, B, nbatch)), np.asarray(X), atol=1e-8
    )
    Bt = la.bgemm(la.transpose_block(A, nbatch), X, nbatch)
    np.testing.assert_allclose(
        np.asarray(la.blu_solve_t(LU, dinv, Bt, nbatch)), np.asarray(X), atol=1e-8
    )


def test_blocked_cholesky_ml_matches_dense():
    """Blocked panel Cholesky (mat-last, MXU path) vs numpy, n=36 > panel."""
    import numpy as np
    from rslqr_tpu import linalg as la

    rng = np.random.default_rng(0)
    B, n = 5, 36
    A = rng.standard_normal((B, n, n))
    spd = A @ np.swapaxes(A, -1, -2) + 10.0 * np.eye(n)
    L = np.asarray(la.cholesky_ml(jnp.asarray(spd)))
    np.testing.assert_allclose(L, np.linalg.cholesky(spd), atol=1e-9)
    # Through the dispatch (batch-last layout).
    spd_bl = np.moveaxis(spd, 0, -1)
    L2 = np.asarray(la.bcholesky(jnp.asarray(spd_bl), 1))
    np.testing.assert_allclose(np.moveaxis(L2, -1, 0), L, atol=1e-9)


def test_blocked_trsm_ml_matches_dense():
    import numpy as np
    from rslqr_tpu import linalg as la

    rng = np.random.default_rng(1)
    B, n, w = 4, 36, 20
    A = rng.standard_normal((B, n, n))
    L = np.tril(A) + 10.0 * np.eye(n)
    Bm = rng.standard_normal((B, n, w))
    X = np.asarray(la.trsm_lower_ml(jnp.asarray(L), jnp.asarray(Bm)))
    np.testing.assert_allclose(L @ X, Bm, atol=1e-8)
    Xt = np.asarray(la.trsm_lower_t_ml(jnp.asarray(L), jnp.asarray(Bm)))
    np.testing.assert_allclose(np.swapaxes(L, -1, -2) @ Xt, Bm, atol=1e-8)


def test_blocked_lu_solve_ml_matches_dense():
    import numpy as np
    from rslqr_tpu import linalg as la

    rng = np.random.default_rng(2)
    B, n, w = 4, 36, 74
    C = rng.standard_normal((B, n, n))
    A = np.eye(n) + 0.1 * (C @ np.swapaxes(C, -1, -2))  # I + PSD: wellcond
    Bm = rng.standard_normal((B, n, w))
    X = np.asarray(la.solve_ml(jnp.asarray(A), jnp.asarray(Bm)))
    np.testing.assert_allclose(A @ X, Bm, atol=1e-7)
    # Through the bsolve dispatch.
    X2 = np.asarray(
        la.bsolve(
            jnp.asarray(np.moveaxis(A, 0, -1)),
            jnp.asarray(np.moveaxis(Bm, 0, -1)),
            1,
        )
    )
    np.testing.assert_allclose(np.moveaxis(X2, -1, 0), X, atol=1e-7)


def test_blocked_batchlast_cholesky_trsm():
    """Batch-last blocked Cholesky/TRSM (lane-major mid-block path)."""
    import numpy as np
    from rslqr_tpu import linalg as la

    rng = np.random.default_rng(3)
    G, n, B = 3, 36, 7
    A = rng.standard_normal((G, n, n, B))
    spd = np.einsum("gijb,gkjb->gikb", A, A) + 10.0 * np.eye(n)[None, :, :, None]
    L = np.asarray(la.bcholesky(jnp.asarray(spd), 1))
    rec = np.einsum("gijb,gkjb->gikb", L, L)
    np.testing.assert_allclose(rec, spd, atol=1e-8)
    assert np.allclose(np.triu(np.moveaxis(L, -1, 1), 1), 0.0)

    w = 20
    Bm = rng.standard_normal((G, n, w, B))
    X = np.asarray(la.btrsm_lower(jnp.asarray(L), jnp.asarray(Bm), 1))
    np.testing.assert_allclose(np.einsum("gijb,gjwb->giwb", L, X), Bm, atol=1e-7)
    Xt = np.asarray(la.btrsm_lower_t(jnp.asarray(L), jnp.asarray(Bm), 1))
    np.testing.assert_allclose(
        np.einsum("gjib,gjwb->giwb", L, Xt), Bm, atol=1e-7
    )
    # Full round trip through bcho_solve: (L L') Y == Bm.
    Y = np.asarray(la.bcho_solve(jnp.asarray(L), jnp.asarray(Bm), 1))
    LLt_Y = np.einsum(
        "gijb,gjwb->giwb", L,
        np.einsum("gjib,gjwb->giwb", L, Y),
    )
    np.testing.assert_allclose(LLt_Y, Bm, atol=1e-6)


def test_blocked_batchlast_solve():
    import numpy as np
    from rslqr_tpu import linalg as la

    rng = np.random.default_rng(4)
    G, n, w, B = 2, 36, 74, 5
    C = rng.standard_normal((G, n, n, B))
    # I + PSD (the scan combine's conditioning): A[g,:,:,b] = I + 0.1 C C'.
    A = 0.1 * np.einsum("gijb,gkjb->gikb", C, C) + np.eye(n)[None, :, :, None]
    Bm = rng.standard_normal((G, n, w, B))
    X = np.asarray(la.bsolve(jnp.asarray(A), jnp.asarray(Bm), 1))
    np.testing.assert_allclose(np.einsum("gijb,gjwb->giwb", A, X), Bm, atol=1e-6)

"""Pallas kernel tests (interpret mode on CPU, per SURVEY §7 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu.ops.schur_pallas import schur_update_level


def _reference_update(FLl, FLx, FLu, Fls, Fxs, Fus, fsol, level, n, m):
    """Straightforward numpy replay of the Schur update semantics."""
    U, N, nn, B = Fls.shape
    span = 1 << (level + 1)
    half = 1 << level
    ol, ox, ou = Fls.copy(), Fxs.copy(), Fus.copy()
    for u in range(U):
        for k in range(N):
            g = k // span
            f = fsol[u, g].reshape(n, n, B)
            keep = (k % half != 0) or (k == 0)
            FL = FLl[k].reshape(n, n, B)
            upd = np.einsum("ijb,jkb->ikb", FL, f)
            if keep:
                ol[u, k] -= upd.reshape(nn, B)
            FX = FLx[k].reshape(n, n, B)
            ox[u, k] -= np.einsum("ijb,jkb->ikb", FX, f).reshape(nn, B)
            FU = FLu[k].reshape(m, n, B)
            ou[u, k] -= np.einsum("ijb,jkb->ikb", FU, f).reshape(m * n, B)
    return ol, ox, ou


@pytest.mark.parametrize("level", [0, 1, 2, 3])
def test_schur_kernel_matches_reference(level):
    n, m, N, B, depth = 6, 3, 16, 8, 4
    U = depth - level - 1
    if U == 0:
        pytest.skip("no upper levels")
    G = N // (1 << (level + 1))
    rng = np.random.default_rng(level)
    FLl = rng.normal(size=(N, n * n, B)).astype(np.float32)
    FLx = rng.normal(size=(N, n * n, B)).astype(np.float32)
    FLu = rng.normal(size=(N, m * n, B)).astype(np.float32)
    Fls = rng.normal(size=(U, N, n * n, B)).astype(np.float32)
    Fxs = rng.normal(size=(U, N, n * n, B)).astype(np.float32)
    Fus = rng.normal(size=(U, N, m * n, B)).astype(np.float32)
    fsol = rng.normal(size=(U, G, n * n, B)).astype(np.float32)

    ol, ox, ou = schur_update_level(
        jnp.asarray(FLl), jnp.asarray(FLx), jnp.asarray(FLu),
        jnp.asarray(Fls), jnp.asarray(Fxs), jnp.asarray(Fus),
        jnp.asarray(fsol), level=level, n=n, m=m, interpret=True,
        tk=8, tb=8,
    )
    rl, rx, ru = _reference_update(FLl, FLx, FLu, Fls, Fxs, Fus, fsol, level, n, m)
    np.testing.assert_allclose(np.asarray(ol), rl, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ox), rx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ou), ru, atol=1e-4)


def test_schur_kernel_span_larger_than_tile():
    """level with span > tile size (one group covers many tiles)."""
    n, m, N, B, depth, level = 2, 1, 32, 4, 5, 3   # span 16 > tk 8
    U = depth - level - 1
    G = N // (1 << (level + 1))
    rng = np.random.default_rng(0)
    FLl = rng.normal(size=(N, n * n, B)).astype(np.float32)
    FLx = rng.normal(size=(N, n * n, B)).astype(np.float32)
    FLu = rng.normal(size=(N, m * n, B)).astype(np.float32)
    Fls = rng.normal(size=(U, N, n * n, B)).astype(np.float32)
    Fxs = rng.normal(size=(U, N, n * n, B)).astype(np.float32)
    Fus = rng.normal(size=(U, N, m * n, B)).astype(np.float32)
    fsol = rng.normal(size=(U, G, n * n, B)).astype(np.float32)
    ol, ox, ou = schur_update_level(
        jnp.asarray(FLl), jnp.asarray(FLx), jnp.asarray(FLu),
        jnp.asarray(Fls), jnp.asarray(Fxs), jnp.asarray(Fus),
        jnp.asarray(fsol), level=level, n=n, m=m, interpret=True,
        tk=8, tb=4,
    )
    rl, rx, ru = _reference_update(FLl, FLx, FLu, Fls, Fxs, Fus, fsol, level, n, m)
    np.testing.assert_allclose(np.asarray(ol), rl, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ox), rx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ou), ru, atol=1e-4)

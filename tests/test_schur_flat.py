"""Flat-plane small-block Schur kernel suite (ops/schur_planes.py) tests.

End-to-end parity of the flat-plane rsLQR path (the production dispatch for
wide batches, B % 1024 == 0) against the XLA element-major path, in
interpreter mode on CPU. Covers the fused leaf + level-0 kernel with
product emission, the multi-upper-level update kernel at every tree level,
and the RHS sweep kernel (ref solve.c:38-190 staging).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rslqr_tpu as rt
from rslqr_tpu.config import SolveOptions
from rslqr_tpu.rslqr_em import _flat_path_ok, solve_em

OPTS_FLAT = SolveOptions(layout="em", pallas="interpret", flat_planes=True)
OPTS_REF = SolveOptions(layout="em", pallas="off")


def _wide_problem(N, n, m, B, seed=0):
    rng = np.random.default_rng(seed)
    A = (np.eye(n) + 0.1 * rng.standard_normal((N, n, n))).astype(np.float32)
    Bd = 0.1 * rng.standard_normal((N, n, m)).astype(np.float32)
    f = 0.01 * rng.standard_normal((N, n)).astype(np.float32)
    Qd = (1.0 + rng.random((N, n))).astype(np.float32)
    Rd = (1.0 + rng.random((N, m))).astype(np.float32)
    q = rng.standard_normal((N, n)).astype(np.float32)
    r = rng.standard_normal((N, m)).astype(np.float32)
    c = np.zeros((N,), dtype=np.float32)
    x0 = rng.standard_normal((n,)).astype(np.float32)
    prob = rt.problem_from_arrays(A, Bd, f, Qd, Rd, q, r, c, x0)
    # Perturb x0 across the batch so instances differ.
    dx = (0.01 * rng.standard_normal((B, n))).astype(np.float32)

    def tile(path_unused, x):
        x = np.asarray(x)
        return jnp.asarray(np.broadcast_to(x, (B,) + x.shape).copy())

    batched = jax.tree_util.tree_map(lambda x: tile(None, x), prob)
    import dataclasses

    return dataclasses.replace(
        batched, x0=jnp.asarray(np.asarray(prob.x0) + dx)
    )


def test_flat_dispatch_applies():
    assert _flat_path_ok(jnp.float32, 1, 16, (1024,))
    assert not _flat_path_ok(jnp.float32, 1, 16, (512,))   # sub-vreg knots
    assert not _flat_path_ok(jnp.float64, 1, 16, (1024,))  # f32 only
    assert not _flat_path_ok(jnp.float32, 2, 16, (8, 128))  # one batch axis


@pytest.mark.parametrize(
    "N,n,m", [(16, 3, 2), (8, 4, 1)], ids=["N16_n3m2", "N8_n4m1"]
)
def test_flat_solve_matches_xla_path(N, n, m):
    prob = _wide_problem(N, n, m, B=1024, seed=N)
    s_flat = solve_em(prob, options=OPTS_FLAT)
    s_ref = solve_em(prob, options=OPTS_REF)
    for name in ("Y", "X", "U"):
        a = np.asarray(getattr(s_flat, name))
        b = np.asarray(getattr(s_ref, name))
        denom = max(np.max(np.abs(b)), 1e-30)
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-6 * denom)


def test_flat_factorization_resolve():
    """Cached-factorization multi-RHS path through the flat RHS kernel."""
    from rslqr_tpu.rslqr_em import factorize_em, leaf_rhs_em, solve_rhs_em

    prob = _wide_problem(16, 3, 2, B=1024, seed=7)
    fact, rhs = factorize_em(prob, options=OPTS_FLAT)
    sol = solve_rhs_em(prob, fact, rhs, options=OPTS_FLAT)
    # Fresh RHS: perturb the cost vectors, re-solve on the cached factors.
    import dataclasses

    prob2 = dataclasses.replace(prob, q=prob.q + 0.01)
    rhs2 = leaf_rhs_em(prob2)
    sol2 = solve_rhs_em(prob2, fact, rhs2, options=OPTS_FLAT)

    ref = solve_em(prob, options=OPTS_REF)
    np.testing.assert_allclose(
        np.asarray(sol.X), np.asarray(ref.X), rtol=0,
        atol=5e-6 * float(np.max(np.abs(np.asarray(ref.X)))),
    )
    assert not np.allclose(np.asarray(sol2.X), np.asarray(sol.X))

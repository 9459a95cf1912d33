"""Mid-block element-plane kernel suite (ops/planes_pallas.py) tests.

Kernel replays against numpy semantics in interpreter mode, plus end-to-end
parity of the mid-block element-major solver paths (rslqr + pscan) against
the grid/MXU paths — the production dispatch for the quadruped regime
(nx=36), where XLA's batched factorizations are pathological (VERDICT r3
missing #1; ref matmul.c:31-574 / linalg.c:153-190 for the role).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rslqr_tpu as rt
from rslqr_tpu import pscan, refine, rslqr
from rslqr_tpu.config import SolveOptions
from rslqr_tpu.ops.planes_pallas import pgemm, pgemm_acc, schur_update_planes

OPTS_EM = SolveOptions(layout="em", pallas="interpret")
OPTS_REF = SolveOptions(layout="grid", pallas="off")


def _planes(key, p, K, P1=8, P2=128):
    return jax.random.normal(key, (p, K, P1, P2), jnp.float64)


def test_pgemm_matches_numpy():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    A = _planes(k1, 5, 7)
    B = _planes(k2, 7, 3)
    out = pgemm(A, B, interpret=True)
    want = np.einsum("ikxy,kjxy->ijxy", A, B)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-12, atol=1e-12)


def test_pgemm_transpose_flags():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    At = _planes(k1, 7, 5)  # stored [K, p]
    Bt = _planes(k2, 3, 7)  # stored [q, K]
    out = pgemm(At, Bt, ta=True, tbt=True, interpret=True)
    want = np.einsum("kixy,jkxy->ijxy", At, Bt)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-12, atol=1e-12)


def test_pgemm_epilogue_flags():
    """diag / dconst / kscale / sym fused epilogues vs numpy (round-5
    scan-combine fusion: I + C J, J + diag(Q), F' diag(Q) M F)."""
    from rslqr_tpu.ops.planes_pallas import _pgemm_call

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(7), 5)
    p_ = 5
    A = _planes(k1, p_, p_)
    B = _planes(k2, p_, p_)
    d = jax.random.normal(k3, (p_, 8, 128), jnp.float64)
    ks = jax.random.normal(k4, (p_, 8, 128), jnp.float64)
    prod = np.einsum("ikxy,kjxy->ijxy", A, B)
    eye = np.eye(p_)[:, :, None, None]

    # dconst: C = A @ B + c * I.
    np.testing.assert_allclose(
        np.asarray(_pgemm_call(A, B, dconst=1.0, interpret=True)),
        prod + eye, rtol=1e-12, atol=1e-12,
    )
    # diag operand: C[i, i] += d[i].
    np.testing.assert_allclose(
        np.asarray(_pgemm_call(A, B, None, d, interpret=True)),
        prod + eye * np.asarray(d)[:, None], rtol=1e-12, atol=1e-12,
    )
    # kscale: C = A @ diag(ks) @ B.
    np.testing.assert_allclose(
        np.asarray(_pgemm_call(A, B, None, None, ks, interpret=True)),
        np.einsum("ikxy,kxy,kjxy->ijxy", A, ks, B),
        rtol=1e-12, atol=1e-12,
    )
    # sym: symmetric product, lower computed + mirrored.
    S = np.einsum("ikxy,jkxy->ijxy", A, A)  # A A' is symmetric
    np.testing.assert_allclose(
        np.asarray(_pgemm_call(A, A, tbt=True, sym=True, interpret=True)),
        S, rtol=1e-12, atol=1e-12,
    )
    # sym + cin + diag together (the J-site shape).
    Csym = S.copy()
    np.testing.assert_allclose(
        np.asarray(
            _pgemm_call(
                A, A, jnp.array(Csym), d, tbt=True, sym=True, sub=False,
                interpret=True,
            )
        ),
        Csym + S + eye * np.asarray(d)[:, None],
        rtol=1e-12, atol=1e-12,
    )


def test_bgemm_tt_flag_fallback_matches_kernel():
    """The XLA fallback epilogues (small blocks / non-plane shapes) agree
    with the kernel path semantics."""
    from rslqr_tpu import linalg as la

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    n = 4  # below the small-block threshold -> XLA fallback
    A = jax.random.normal(k1, (n, n, 16), jnp.float64)
    Rd = jax.random.normal(k2, (n, 16), jnp.float64)
    ks = jax.random.normal(k3, (n, 16), jnp.float64)
    out = la.bgemm_tt(A, A, 1, tbt=True, diag=Rd, dconst=2.0, kscale=ks,
                      sym=True)
    want = np.einsum("ikb,kb,jkb->ijb", A, ks, A)
    want += np.eye(n)[:, :, None] * (np.asarray(Rd)[:, None] + 2.0)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-12, atol=1e-12)


def test_pgemm_acc_sub_and_add():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    A = _planes(k1, 4, 6)
    B = _planes(k2, 6, 4)
    C = _planes(k3, 4, 4)
    # Cin is DONATED (aliased onto the output): snapshot it and pass a
    # fresh copy per call.
    C_np = np.asarray(C).copy()
    prod = np.einsum("ikxy,kjxy->ijxy", A, B)
    np.testing.assert_allclose(
        np.asarray(pgemm_acc(A, B, jnp.array(C_np), sub=True, interpret=True)),
        C_np - prod,
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(
            pgemm_acc(A, B, jnp.array(C_np), sub=False, interpret=True)
        ),
        C_np + prod,
        rtol=1e-12, atol=1e-12,
    )


def test_pgemm_multirow_tiles():
    """P1 > t1 exercises the grid's row dimension (and the flat-index math
    of the masked variant below)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    A = _planes(k1, 3, 5, P1=32, P2=128)
    B = _planes(k2, 5, 2, P1=32, P2=128)
    out = pgemm(A, B, interpret=True)
    want = np.einsum("ikxy,kjxy->ijxy", A, B)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("level", [0, 1, 2])
def test_schur_update_planes_masks(level):
    """The fused lambda-slab update reproduces ndlqr_UpdateShurFactor +
    ShouldCalcLambda + the separator write-back (nested_dissection.c:
    154-177, solve.c:92-97) on a flattened (knot x batch) plane."""
    N, Bw = 32, 32  # 32 knots x 32 batch lanes = 1024-element plane
    n = 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    FL = jax.random.normal(k1, (n, n, N, Bw), jnp.float64)
    fsol = jax.random.normal(k2, (n, n, N, Bw), jnp.float64)
    Fin_np = np.asarray(
        jax.random.normal(k3, (n, n, N, Bw), jnp.float64)
    ).copy()
    Fin = jnp.array(Fin_np)  # donated below; re-made per call
    flat = lambda x: x.reshape(n, n, N * Bw // 128, 128)
    logb = Bw.bit_length() - 1

    out = schur_update_planes(
        flat(FL), flat(fsol), flat(Fin),
        level=level, lam=True, logb=logb, interpret=True,
    ).reshape(n, n, N, Bw)

    upd = np.einsum("ikxy,kjxy->ijxy", FL, fsol)
    knots = np.arange(N)
    halfspan, span = 1 << level, 2 << level
    keep = ((knots % halfspan) != 0) | (knots == 0)
    sep = (knots % span) == halfspan
    want = Fin_np - np.where(keep[None, None, :, None], upd, 0.0)
    want = np.where(sep[None, None, :, None], np.asarray(fsol), want)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-12, atol=1e-12)

    # Plain (x/u slab) variant: unmasked subtract.
    out2 = schur_update_planes(
        flat(FL), flat(fsol), flat(jnp.array(Fin_np)),
        level=level, lam=False, logb=logb, interpret=True,
    ).reshape(n, n, N, Bw)
    np.testing.assert_allclose(np.asarray(out2), Fin_np - upd, rtol=1e-12, atol=1e-12)


@pytest.fixture(scope="module")
def mid_batch():
    # B=128 satisfies the compiled planes kernels' lane-alignment gate
    # (interpret mode accepts any width, but keep tests on the production
    # shape contract).
    prob = rt.random_problem(jax.random.PRNGKey(0), 16, 12, 4, jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(1), 128)
    return rt.batch_problems(prob, keys)


def test_rslqr_midblock_em_parity(mid_batch):
    """Element-major rsLQR with the planes kernels == grid/MXU path."""
    ref = rslqr.solve_kkt(mid_batch, options=OPTS_REF)
    em = rslqr.solve_kkt(mid_batch, options=OPTS_EM)
    assert float(jnp.max(jnp.abs(em - ref))) < 1e-10 * float(
        jnp.max(jnp.abs(ref))
    ) + 1e-12


def test_rslqr_midblock_em_kkt_residual(mid_batch):
    out = rslqr.solve_kkt(mid_batch, options=OPTS_EM)
    one = jax.tree.map(lambda x: x[0], mid_batch)
    assert float(rt.kkt_residual(one, out[0])) < 1e-10


def test_pscan_midblock_em_parity(mid_batch):
    ref = pscan.solve_pscan_kkt(mid_batch, options=OPTS_REF)
    em = pscan.solve_pscan_kkt(mid_batch, options=OPTS_EM)
    # Same math in a new layout; XLA may re-associate fused reductions.
    assert float(jnp.max(jnp.abs(em - ref))) < 1e-11


@pytest.mark.parametrize("s", [2, 4, 8])
def test_pscan_midblock_chunked_parity(mid_batch, s):
    """Chunked hybrid value scan (serial Woodbury leaf folds + tree over
    N/s composites + within-chunk down-sweep) == the grid/MXU path."""
    ref = pscan.solve_pscan_kkt(mid_batch, options=OPTS_REF)
    opts = SolveOptions(layout="em", pallas="interpret", pscan_chunk=s)
    em = pscan.solve_pscan_kkt(mid_batch, options=opts)
    assert float(jnp.max(jnp.abs(em - ref))) < 1e-11


def test_pscan_midblock_chunked_fused_gains(mid_batch):
    """The chunked down-sweep emits (K, d) from its own Woodbury
    intermediates (Sm = Quu R^-1, TA1 = Qux); the full solution pytree —
    not just the KKT vector — must match the grid path."""
    sol_g = pscan.solve_pscan(mid_batch, options=OPTS_REF)
    opts = SolveOptions(layout="em", pallas="interpret", pscan_chunk=4)
    sol_c = pscan.solve_pscan(mid_batch, options=opts)
    for f in ("K", "d", "P", "p", "X", "U", "Y"):
        err = float(jnp.max(jnp.abs(getattr(sol_c, f) - getattr(sol_g, f))))
        assert err < 1e-10, (f, err)


def test_pscan_midblock_chunked_odd_chunk_count():
    """N=24 with s=8 -> 3 chunks: odd peel inside the composite tree."""
    prob = rt.random_problem(jax.random.PRNGKey(7), 24, 12, 4, jnp.float64)
    batch = rt.batch_problems(
        prob, jax.random.split(jax.random.PRNGKey(8), 64)
    )
    ref = pscan.solve_pscan_kkt(batch, options=OPTS_REF)
    opts = SolveOptions(layout="em", pallas="interpret", pscan_chunk=8)
    em = pscan.solve_pscan_kkt(batch, options=opts)
    assert float(jnp.max(jnp.abs(em - ref))) < 1e-11


@pytest.mark.parametrize("s", [2, 4, 8])
def test_pscan_midblock_batched_interior_parity(mid_batch, s):
    """pscan_batched_interior: the fold scans emit their carries (the
    within-chunk suffix/prefix composites) and interior cost-to-gos /
    rollout states are recovered in one full-width reduced combine /
    gemv instead of s-1 serial steps. The full solution pytree — the
    batched path reassociates both the value and the rollout algebra —
    must match the grid path."""
    sol_g = pscan.solve_pscan(mid_batch, options=OPTS_REF)
    opts = SolveOptions(
        layout="em", pallas="interpret", pscan_chunk=s,
        pscan_batched_interior=True,
    )
    sol_c = pscan.solve_pscan(mid_batch, options=opts)
    for f in ("K", "d", "P", "p", "X", "U", "Y"):
        err = float(jnp.max(jnp.abs(getattr(sol_c, f) - getattr(sol_g, f))))
        assert err < 1e-10, (f, err)


def test_pscan_midblock_batched_interior_odd_chunks():
    """Odd chunk count + rollout identity-padding under the batched
    interior recovery (N=24, s=8 -> C=3; rollout L=23 pads to 24)."""
    prob = rt.random_problem(jax.random.PRNGKey(7), 24, 12, 4, jnp.float64)
    batch = rt.batch_problems(
        prob, jax.random.split(jax.random.PRNGKey(8), 64)
    )
    ref = pscan.solve_pscan_kkt(batch, options=OPTS_REF)
    opts = SolveOptions(
        layout="em", pallas="interpret", pscan_chunk=8,
        pscan_batched_interior=True,
    )
    em = pscan.solve_pscan_kkt(batch, options=opts)
    assert float(jnp.max(jnp.abs(em - ref))) < 1e-11


def test_pscan_chunk_invalid_raises(mid_batch):
    """Explicit chunk sizes must divide the horizon with >= 2 chunks."""
    opts = SolveOptions(layout="em", pallas="interpret", pscan_chunk=5)
    with pytest.raises(ValueError, match="pscan_chunk"):
        pscan.solve_pscan_kkt(mid_batch, options=opts)


def test_pscan_midblock_em_odd_horizon():
    """N=24 exercises the odd-peeling branches of every em scan helper."""
    prob = rt.random_problem(jax.random.PRNGKey(5), 24, 12, 4, jnp.float64)
    batch = rt.batch_problems(
        prob, jax.random.split(jax.random.PRNGKey(6), 128)
    )
    ref = pscan.solve_pscan_kkt(batch, options=OPTS_REF)
    em = pscan.solve_pscan_kkt(batch, options=OPTS_EM)
    assert float(jnp.max(jnp.abs(em - ref))) < 1e-11


def test_refine_midblock_em(mid_batch):
    """Mixed-precision refinement over the mid-block em factorization."""
    sol = refine.solve_refined(mid_batch, iterations=2, options=OPTS_EM)
    ref = rslqr.solve_kkt(mid_batch, options=OPTS_REF)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(sol.kkt_vector() - ref))) < 1e-8 * scale


def test_midblock_em_solve_twice_bitwise(mid_batch):
    """Purity/no-hidden-state (the reference's solve-twice test,
    nested_dissection_test.c:285-313)."""
    a = rslqr.solve_kkt(mid_batch, options=OPTS_EM)
    b = rslqr.solve_kkt(mid_batch, options=OPTS_EM)
    assert jnp.array_equal(a, b)

"""rsLQR solver tests, mirroring the reference's nested_dissection_test.c,
solver_test.c, and sample_problem_test.c golden-value strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu import io, problem, riccati, rslqr, tree


@pytest.fixture(scope="module")
def prob8():
    prob, soln = io.read_lqr_problem_json("/root/reference/lqr_prob.json")
    return prob, soln


@pytest.fixture(scope="module")
def golden():
    return io.read_all_named_matrices("/root/reference/sample_problem.json")


def test_leaf_solve_blocks(prob8):
    """Mirror nested_dissection_test.c:11-105 (SolveLeaves)."""
    prob, _ = prob8
    t = tree.build_tree_tables(prob.nhorizon)
    Fl, Fx, Fu, zy, zx, zu = rslqr._leaf_solve(prob, t.levels, t.depth)
    A0 = np.asarray(prob.A[0])
    B0 = np.asarray(prob.B[0])
    R0 = np.asarray(prob.Rdiag[0])
    Q1 = np.asarray(prob.Qdiag[1])
    # knot 0, level 0: Fy = -A0', Fx = 0, Fu = R^{-1} B0'
    np.testing.assert_allclose(np.asarray(Fl[0, 0]), -A0.T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Fx[0, 0]), 0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Fu[0, 0]), B0.T / R0[:, None], atol=1e-12)
    # knot 0 RHS literals (nested_dissection_test.c:48-52)
    z0 = np.concatenate([np.asarray(zy[0]), np.asarray(zx[0]), np.asarray(zu[0])])
    np.testing.assert_allclose(
        z0,
        [-1.0, -2.2, 1.6, -1.6, 4.2, -1.0, 1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 100.0, -0.0, -100.0],
        atol=1e-9,
    )
    # knot 1, level 1 (own dynamics): Fx = Q^{-1} A', Fu = R^{-1} B'
    np.testing.assert_allclose(
        np.asarray(Fx[1, 1]), A0.T / Q1[:, None], atol=1e-12
    )
    # knot 1, level 0 (previous step): Fx = -Q^{-1}
    np.testing.assert_allclose(
        np.asarray(Fx[0, 1]), -np.diag(1.0 / Q1), atol=1e-12
    )
    # knot 1 RHS literals (nested_dissection_test.c:71-75)
    z1 = np.concatenate([np.asarray(zy[1]), np.asarray(zx[1]), np.asarray(zu[1])])
    np.testing.assert_allclose(
        z1,
        [-1.5, -1.5, -1.5, -1.5, -1.5, -1.5, 4.0, 2.4, 0.8, -0.8, -2.4, -4.0, 200.0, -0.0, -200.0],
        atol=1e-9,
    )


def test_leaf_rhs_matches_golden_b(prob8, golden):
    """Leaf-solved RHS equals the golden assembled 'b' (nested_dissection_test.c:102-105)."""
    prob, _ = prob8
    t = tree.build_tree_tables(prob.nhorizon)
    _, _, _, zy, zx, zu = rslqr._leaf_solve(prob, t.levels, t.depth)
    b = problem.pack_solution(zy, zx, zu[:-1])
    # The golden 'b' is the reference's full 120-double soln buffer: nvars=117
    # solution entries plus the terminal factor's unused input scratch block
    # (nddata.c:33 allocates (2n+m)*N regardless of the missing terminal u).
    np.testing.assert_allclose(np.asarray(b), golden["b"][: prob.nvars], atol=1e-9)


def test_sbar_literal(prob8):
    """First inner product Sbar matches the literal (nested_dissection_test.c:116-136)."""
    prob, _ = prob8
    t = tree.build_tree_tables(prob.nhorizon)
    Fl, Fx, Fu, *_ = rslqr._leaf_solve(prob, t.levels, t.depth)
    S = (
        np.asarray(prob.A[0]) @ np.asarray(Fx[0, 0])
        + np.asarray(prob.B[0]) @ np.asarray(Fu[0, 0])
        - np.asarray(Fx[0, 1])
        - np.asarray(Fl[0, 1])
    )
    Sans = np.array(
        [
            [1.0025, 0.0, 0.0, 0.05, 0.0, 0.0],
            [0.0, 1.0025, 0.0, 0.0, 0.05, 0.0],
            [0.0, 0.0, 1.0025, 0.0, 0.0, 0.05],
            [0.05, 0.0, 0.0, 2.0, 0.0, 0.0],
            [0.0, 0.05, 0.0, 0.0, 2.0, 0.0],
            [0.0, 0.0, 0.05, 0.0, 0.0, 2.0],
        ]
    )
    np.testing.assert_allclose(S, Sans, atol=1e-6)


def test_schur_complement_golden_blocks(prob8, golden):
    """After the level-0 sweep, knots 0-1 upper-level blocks match the golden
    E{knot}{level}{y,x,u} factors (nested_dissection_test.c:138-237)."""
    prob, _ = prob8
    t = tree.build_tree_tables(prob.nhorizon)
    Fl, Fx, Fu, *_ = rslqr._leaf_solve(prob, t.levels, t.depth)
    fact = rslqr.RsLqrFactorization(
        Flambda=Fl, Fstate=Fx, Finput=Fu, chol=jnp.zeros((7, 6, 6), Fl.dtype)
    )
    fact = rslqr._sweep_level(prob, t, 0, fact)
    for knot in range(2):
        for upper in (1, 2):
            np.testing.assert_allclose(
                np.asarray(fact.Flambda[upper, knot]),
                golden[f"E{knot}{upper}y"],
                atol=1e-6,
                err_msg=f"E{knot}{upper}y",
            )
            np.testing.assert_allclose(
                np.asarray(fact.Fstate[upper, knot]),
                golden[f"E{knot}{upper}x"],
                atol=1e-6,
                err_msg=f"E{knot}{upper}x",
            )
            np.testing.assert_allclose(
                np.asarray(fact.Finput[upper, knot]),
                golden[f"E{knot}{upper}u"],
                atol=1e-6,
                err_msg=f"E{knot}{upper}u",
            )


def test_full_solve_n8(prob8):
    """End-to-end rsLQR vs golden solution (< 1e-6, nested_dissection_test.c:277)."""
    prob, soln = prob8
    out = jax.jit(rslqr.solve_kkt)(prob)
    err = np.max(np.abs(np.asarray(out) - soln))
    assert err < 1e-6, f"rsLQR parity error {err}"


def test_full_solve_n256():
    prob, soln = io.read_lqr_problem_json("/root/reference/lqr_prob_256.json")
    out = jax.jit(rslqr.solve_kkt)(prob)
    err = np.max(np.abs(np.asarray(out) - soln))
    assert err < 1e-6, f"rsLQR parity error {err}"


def test_rslqr_matches_riccati(prob8):
    """Cross-solver agreement < 1e-6 (sample_problem_test.c:153-157)."""
    prob, _ = prob8
    a = rslqr.solve_kkt(prob)
    b = riccati.solve_riccati(prob).kkt_vector()
    assert float(jnp.max(jnp.abs(a - b))) < 1e-6


def test_solve_twice_idempotent(prob8):
    """Purity analogue of the reference's solve-twice/reset test
    (nested_dissection_test.c:285-313): same inputs, bitwise-same outputs."""
    prob, _ = prob8
    f = jax.jit(rslqr.solve_kkt)
    a = np.asarray(f(prob))
    b = np.asarray(f(prob))
    np.testing.assert_array_equal(a, b)


def test_vmap_batch_solve(prob8):
    prob, _ = prob8
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    batch = problem.batch_problems(prob, keys)
    outs = jax.jit(jax.vmap(rslqr.solve_kkt))(batch)
    assert outs.shape == (8, prob.nvars)
    # Every batched solve satisfies its own KKT system.
    for i in range(8):
        single = jax.tree.map(lambda x: x[i], batch)
        res = problem.kkt_residual(single, outs[i])
        assert float(res) < 1e-8, f"instance {i} residual {res}"


def test_multi_rhs_reuse(prob8):
    """The cached factorization solves fresh right-hand sides (the multi-RHS
    mode the reference only hints at, nddata.h:72-75): perturb q/r/x0 only
    and re-solve without re-factorizing."""
    prob, _ = prob8
    t = tree.build_tree_tables(prob.nhorizon)
    fact, _ = rslqr.factorize(prob, t)
    import dataclasses

    prob2 = dataclasses.replace(
        prob, q=prob.q + 0.5, r=prob.r - 0.25, x0=prob.x0 + 0.1
    )
    _, _, _, zy, zx, zu = rslqr._leaf_solve(prob2, t.levels, t.depth)
    out = rslqr.solve_rhs(prob2, fact, (zy, zx, zu), t)
    res = problem.kkt_residual(prob2, out.kkt_vector())
    assert float(res) < 1e-8


def test_native_batch_matches_vmap(prob8):
    """The batch-last native path must agree with per-instance solves."""
    prob, _ = prob8
    keys = jax.random.split(jax.random.PRNGKey(3), 5)
    batch = problem.batch_problems(prob, keys)
    native = rslqr.solve_kkt(batch)  # leading batch axis, internal batch-last
    assert native.shape == (5, prob.nvars)
    singles = jax.vmap(rslqr.solve_kkt)(batch)
    np.testing.assert_allclose(
        np.asarray(native), np.asarray(singles), atol=1e-9
    )


def test_quadruped_scale_config(no_persistent_cache_write):
    """Large-block config (BASELINE.md: nx=36, nu=12, N=512 class) exercises
    the MXU dispatch path in linalg; checked via KKT residual at N=32."""
    prob = problem.random_problem(jax.random.PRNGKey(11), 32, 36, 12, jnp.float64)
    out = rslqr.solve_kkt(prob)
    res = problem.kkt_residual(prob, out)
    assert float(res) < 1e-6, f"residual {res}"


def test_quadruped_batched_vmap_path(no_persistent_cache_write):
    """Batched large-block solves take the vmap fast path (no per-op
    mat-last transposes) and must match the per-instance solves exactly,
    for BOTH solver families (VERDICT r2 item #2). The cache-write guard
    avoids the serialize() segfault of these giant programs (conftest)."""
    from rslqr_tpu import pscan
    import rslqr_tpu as rt

    single = problem.random_problem(
        jax.random.PRNGKey(12), 32, 36, 12, jnp.float64
    )
    keys = jax.random.split(jax.random.PRNGKey(13), 3)
    batch = rt.batch_problems(single, keys)

    got = jax.jit(rslqr.solve_kkt)(batch)
    got_ps = jax.jit(pscan.solve_pscan_kkt)(batch)
    assert got.shape[0] == 3 and got_ps.shape == got.shape
    for i in range(3):
        pi = jax.tree.map(lambda x: x[i], batch)
        want = rslqr.solve_kkt(pi)
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(want), atol=1e-9
        )
        res = problem.kkt_residual(pi, got_ps[i])
        assert float(res) < 1e-6, f"pscan residual {res}"


def test_solver_is_differentiable(prob8):
    """Beyond-reference capability: gradients flow through the solve
    (enables learning-based MPC; everything is pure XLA)."""
    prob, _ = prob8

    def loss(q):
        import dataclasses
        p = dataclasses.replace(prob, q=q)
        sol = rslqr.solve(p)
        return jnp.sum(sol.U ** 2)

    g = jax.grad(loss)(prob.q)
    assert g.shape == prob.q.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    # Finite-difference check on one coordinate.
    eps = 1e-6
    e = jnp.zeros_like(prob.q).at[2, 1].set(eps)
    fd = (loss(prob.q + e) - loss(prob.q - e)) / (2 * eps)
    assert abs(float(g[2, 1]) - float(fd)) < 1e-4 * max(1.0, abs(float(fd)))

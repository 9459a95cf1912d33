"""Riccati oracle parity tests, mirroring the reference's riccati_solver_test.c."""

import jax
import numpy as np
import pytest

from rslqr_tpu import io, problem, riccati


def test_riccati_parity_n8(lqr_prob_path):
    """End-to-end solve must match the golden solution to 1e-10.

    Same bar as the reference (test/riccati_solver_test.c:332-349).
    """
    prob, soln = io.read_lqr_problem_json(lqr_prob_path)
    out = jax.jit(riccati.solve_riccati)(prob)
    got = np.asarray(out.kkt_vector())
    err = np.max(np.abs(got - soln)) / max(1.0, np.max(np.abs(soln)))
    assert err < 1e-10, f"riccati parity error {err}"


def test_riccati_parity_n256(lqr_prob_256_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_256_path)
    out = jax.jit(riccati.solve_riccati)(prob)
    got = np.asarray(out.kkt_vector())
    err = np.max(np.abs(got - soln)) / max(1.0, np.max(np.abs(soln)))
    assert err < 1e-8, f"riccati parity error {err}"


def test_kkt_residual_is_zero_at_solution(lqr_prob_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_path)
    res = problem.kkt_residual(prob, np.asarray(soln))
    assert float(res) < 1e-8


def test_riccati_satisfies_kkt_random():
    key = jax.random.PRNGKey(0)
    prob = problem.random_problem(key, 16, 4, 2, dtype=jax.numpy.float64)
    out = riccati.solve_riccati(prob)
    res = problem.kkt_residual(prob, out.kkt_vector())
    assert float(res) < 1e-8


def test_riccati_vmap_batch():
    base = problem.double_integrator_problem(16)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = problem.batch_problems(base, keys)
    outs = jax.vmap(riccati.solve_riccati)(batch)
    assert outs.X.shape == (4, 16, 6)
    for i in range(4):
        single = jax.tree.map(lambda x: x[i], batch)
        res = problem.kkt_residual(single, jax.vmap(lambda s: s.kkt_vector())(outs)[i])
        assert float(res) < 1e-8


def test_solution_pack_unpack(lqr_prob_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_path)
    Y, X, U = problem.unpack_solution(prob, np.asarray(soln))
    repacked = problem.pack_solution(Y, X, U)
    np.testing.assert_array_equal(np.asarray(repacked), soln)


def test_backward_step_literals(lqr_prob_path):
    """One backward step at k=N-2 vs the reference's hard-coded expansions.

    The reference pins Qx/Qu/Qxx/Quu/Qux, then K/d, then P/p for a single
    step seeded with the terminal cost (riccati_solver_test.c:47-223,
    RiccatiStepTest) so that a regression in the *middle* of the backward
    pass is localized by a unit test, not just end-to-end parity.
    """
    prob, _ = io.read_lqr_problem_json(lqr_prob_path)
    k = prob.nhorizon - 2
    P_next = np.diag(np.asarray(prob.Qdiag[-1]))
    p_next = np.asarray(prob.q[-1])
    Qx, Qu, Qxx, Quu, Qux, K, d, P, p = riccati.backward_step(
        P_next, p_next, prob.A[k], prob.B[k], prob.f[k],
        prob.Qdiag[k], prob.Rdiag[k], prob.q[k], prob.r[k],
    )
    # Literal expected values from riccati_solver_test.c:87-117.
    np.testing.assert_allclose(
        np.asarray(Qx),
        [-69.0, 0.5999999999999996, 70.2, 134.3, 210.3, 286.3],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(Qu), [6.425000000000001, 20.145, 33.865], atol=1e-6
    )
    n = Qxx.shape[0]
    Qxx_exp = np.zeros((n, n))
    Qxx_exp[:3, :3] = np.eye(3) * 11.0
    Qxx_exp[3:, 3:] = np.eye(3) * 11.1
    Qxx_exp[:3, 3:] = np.eye(3) * 1.0
    Qxx_exp[3:, :3] = np.eye(3) * 1.0
    np.testing.assert_allclose(np.asarray(Qxx), Qxx_exp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Quu), np.eye(3) * 0.11025, atol=1e-6)
    Qux_exp = np.concatenate([np.eye(3) * 0.05, np.eye(3) * 1.005], axis=1)
    np.testing.assert_allclose(np.asarray(Qux), Qux_exp, atol=1e-6)
    # Gains and cost-to-go spot values (riccati_solver_test.c:138-220).
    assert abs(float(K[0, 0]) - (-0.4535147392290251)) < 1e-6
    assert abs(float(K[2, 5]) - (-9.1156462585034)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(d),
        [-58.27664399092971, -182.72108843537413, -307.1655328798186],
        atol=1e-6,
    )
    assert abs(float(P[0, 0]) - 10.977324263038549) < 1e-6
    assert abs(float(P[5, 5]) - 1.9387755102040813) < 1e-6
    np.testing.assert_allclose(
        np.asarray(p),
        [-71.91383219954649, -8.536054421768709, 54.84172335600907,
         75.73197278911566, 26.66530612244904, -22.401360544217596],
        atol=1e-6,
    )


def test_backward_pass_k0_literals(lqr_prob_path):
    """Full backward pass: k=0 gains/cost-to-go vs the reference's literals
    (riccati_solver_test.c:228-305, BackwardPassTest)."""
    prob, _ = io.read_lqr_problem_json(lqr_prob_path)
    K, d, P, p = riccati.backward_pass(prob)
    assert abs(float(P[0][0, 0]) - 11.774910288989293) < 1e-6
    assert abs(float(P[0][5, 5]) - 1.7402346445435521) < 1e-6
    np.testing.assert_allclose(
        np.asarray(p[0]),
        [109.00822409796677, 181.20262227329562, 253.3970204486244,
         32.229649977292816, 26.00963298587046, 19.78961599444808],
        atol=1e-6,
    )
    assert abs(float(K[0][0, 0]) - (-6.005830262804116)) < 1e-6
    assert abs(float(K[0][2, 5]) - (-6.832682175070581)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(d[0]),
        [-162.79238772394484, -156.8950187220568, -150.99764972016862],
        atol=1e-6,
    )

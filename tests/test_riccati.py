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

"""Parallel-scan Riccati solver tests: parity against the serial oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu import io, problem, pscan, riccati


@pytest.fixture(scope="module")
def prob8():
    return io.read_lqr_problem_json("/root/reference/lqr_prob.json")


def test_pscan_matches_riccati_n8(prob8):
    prob, soln = prob8
    ser = riccati.solve_riccati(prob)
    par = pscan.solve_pscan(prob)
    np.testing.assert_allclose(np.asarray(par.P), np.asarray(ser.P), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.p), np.asarray(ser.p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(ser.K), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.d), np.asarray(ser.d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.X), np.asarray(ser.X), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.U), np.asarray(ser.U), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.Y), np.asarray(ser.Y), atol=1e-8)


def test_pscan_golden_parity_n8(prob8):
    prob, soln = prob8
    got = np.asarray(jax.jit(pscan.solve_pscan_kkt)(prob))
    err = np.max(np.abs(got - soln))
    assert err < 1e-8, f"pscan parity error {err}"


def test_pscan_golden_parity_n256():
    prob, soln = io.read_lqr_problem_json("/root/reference/lqr_prob_256.json")
    got = np.asarray(jax.jit(pscan.solve_pscan_kkt)(prob))
    err = np.max(np.abs(got - soln)) / max(1.0, np.abs(soln).max())
    assert err < 1e-8, f"pscan parity error {err}"


def test_pscan_batched(prob8):
    prob, _ = prob8
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    batch = problem.batch_problems(prob, keys)
    outs = pscan.solve_pscan_kkt(batch)
    assert outs.shape == (6, prob.nvars)
    for i in range(6):
        single = jax.tree.map(lambda x: x[i], batch)
        res = problem.kkt_residual(single, outs[i])
        assert float(res) < 1e-8, f"instance {i}: {res}"


def test_pscan_random_kkt():
    key = jax.random.PRNGKey(7)
    prob = problem.random_problem(key, 32, 4, 2, dtype=jnp.float64)
    out = pscan.solve_pscan_kkt(prob)
    assert float(problem.kkt_residual(prob, out)) < 1e-7


@pytest.mark.parametrize("N", [2, 3, 5, 7, 13])
def test_pscan_non_pow2_horizon(N):
    """pscan (unlike the tree solver) accepts any horizon: exercises the
    odd-length peel branches of the hand-rolled odd-even scans."""
    prob = problem.random_problem(jax.random.PRNGKey(N), N, 4, 2, dtype=jnp.float64)
    out = pscan.solve_pscan_kkt(prob)
    assert float(problem.kkt_residual(prob, out)) < 1e-7
    ser = riccati.solve_riccati(prob)
    par = pscan.solve_pscan(prob)
    np.testing.assert_allclose(np.asarray(par.X), np.asarray(ser.X), atol=1e-8)
    np.testing.assert_allclose(np.asarray(par.P), np.asarray(ser.P), atol=1e-8)

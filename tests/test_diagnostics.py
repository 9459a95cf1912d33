"""Failure-detection / solution-verification tests (SURVEY §5.2-5.3 parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu import diagnostics, io, problem, rslqr


def test_ok_solution(lqr_prob_path):
    prob, _ = io.read_lqr_problem_json(lqr_prob_path)
    vec = rslqr.solve_kkt(prob)
    rep = diagnostics.check_solution(prob, vec)
    assert int(rep.status) == diagnostics.SolveStatus.OK
    assert bool(rep.finite)
    diagnostics.assert_solution_ok(prob, vec)


def test_factorization_failure_detected(lqr_prob_path):
    """A non-SPD problem (negative Q) must be flagged, not silently wrong —
    the reference's unchecked clap_kCholeskyFail path, done properly."""
    prob, _ = io.read_lqr_problem_json(lqr_prob_path)
    bad = dataclasses.replace(prob, Qdiag=-prob.Qdiag, Rdiag=-prob.Rdiag)
    sol = rslqr.solve(bad)
    ok = diagnostics.factorization_ok(sol.fact)
    assert not bool(ok)
    rep = diagnostics.check_solution(bad, sol.kkt_vector())
    assert int(rep.status) == diagnostics.SolveStatus.FACTORIZATION_FAILED
    with pytest.raises(RuntimeError):
        diagnostics.assert_solution_ok(bad, sol.kkt_vector())


def test_batched_mixed_status(lqr_prob_path):
    prob, _ = io.read_lqr_problem_json(lqr_prob_path)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    batch = problem.batch_problems(prob, keys)
    # Poison instance 1 only.
    Q = np.asarray(batch.Qdiag).copy()
    Q[1] = -Q[1]
    batch = dataclasses.replace(batch, Qdiag=jnp.asarray(Q))
    vec = rslqr.solve_kkt(batch)
    rep = diagnostics.check_solution(batch, vec)
    status = np.asarray(rep.status)
    assert status[0] == diagnostics.SolveStatus.OK
    assert status[1] != diagnostics.SolveStatus.OK
    assert status[2] == diagnostics.SolveStatus.OK

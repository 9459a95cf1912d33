"""Mixed-precision iterative refinement tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu import io, problem, refine


def test_refined_hits_reference_accuracy_n256():
    """f32 factorization + 2 refinement steps must beat the reference's
    1e-6 control-error bar (BASELINE.md) on the shipped N=256 problem."""
    prob, gold = io.read_lqr_problem_json("/root/reference/lqr_prob_256.json")
    gY, gX, gU = problem.unpack_solution(prob, jnp.asarray(gold))
    sol = refine.solve_refined(prob, iterations=2)
    uerr = np.abs(np.asarray(sol.U) - np.asarray(gU)).max()
    assert uerr < 1e-8, f"u error {uerr}"
    res = float(problem.kkt_residual(prob, sol.kkt_vector()))
    assert res < 1e-8


def test_refined_batched():
    prob, _ = io.read_lqr_problem_json("/root/reference/lqr_prob.json")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = problem.batch_problems(prob, keys)
    sol = refine.solve_refined(batch, iterations=2)
    vec = sol.kkt_vector()
    assert vec.shape == (4, prob.nvars)
    for i in range(4):
        single = jax.tree.map(lambda x: x[i], batch)
        assert float(problem.kkt_residual(single, vec[i])) < 1e-8


def test_kkt_apply_consistent_with_residual():
    """kkt_apply at the exact solution reproduces the RHS (residual ~ 0)."""
    prob, gold = io.read_lqr_problem_json("/root/reference/lqr_prob.json")
    Y, X, U = problem.unpack_solution(prob, jnp.asarray(gold))
    U_pad = jnp.concatenate([U, jnp.zeros((1, prob.ninputs))], axis=0)
    My, Mx, Mu = refine.kkt_apply(prob, Y, X, U_pad)
    by, bx, bu = refine.kkt_rhs(prob)
    assert float(jnp.abs(My - by).max()) < 1e-8
    assert float(jnp.abs(Mx - bx).max()) < 1e-8
    assert float(jnp.abs((Mu - bu)[:-1]).max()) < 1e-8

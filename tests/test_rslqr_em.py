"""Element-major solver parity: pinned to the grid path, which is itself
pinned to the reference's golden data (tests/test_rslqr.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rslqr_tpu as rt
from rslqr_tpu import rslqr, rslqr_em


def test_em_layout_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 5.0).reshape(2, 3, 4, 5)  # [N, p, q, b]
    y = rslqr_em._em(x)
    assert y.shape == (3, 4, 2, 5)
    assert jnp.array_equal(jnp.moveaxis(y, 2, 0), x)
    v = jnp.arange(2 * 3 * 5.0).reshape(2, 3, 5)
    assert jnp.array_equal(rslqr_em._emv_bl(rslqr_em._emv(v)), v)


def test_em_group_select():
    x = jnp.arange(6 * 8 * 2.0).reshape(6, 8, 2)  # [p, N, b]
    g = rslqr_em._gk(x, 4, 1)
    assert g.shape == (6, 2, 4, 2)
    np.testing.assert_array_equal(
        np.asarray(rslqr_em._sel(g, 1, 1)), np.asarray(x[:, 1::4])
    )
    assert jnp.array_equal(rslqr_em._ugk(g, 1), x)


@pytest.mark.parametrize("path", ["lqr_prob_path", "lqr_prob_256_path"])
def test_em_solve_matches_golden(path, request):
    prob, gold = rt.read_lqr_problem_json(request.getfixturevalue(path))
    vec = jax.jit(rslqr_em.solve_kkt_em)(prob)
    assert np.abs(np.asarray(vec) - gold).max() < 1e-6
    # And near-bitwise agreement with the grid path (same numerics).
    ref = jax.jit(rslqr.solve_kkt)(prob)
    np.testing.assert_allclose(np.asarray(vec), np.asarray(ref), atol=1e-9)


def test_em_batched_solve(lqr_prob_path):
    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    keys = jax.random.split(jax.random.PRNGKey(3), 5)
    batch = rt.batch_problems(prob, keys)
    got = jax.jit(rslqr_em.solve_kkt_em)(batch)
    want = jax.jit(rslqr.solve_kkt)(batch)
    assert got.shape == want.shape == (5, prob.nvars)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_em_multi_rhs_reuse(lqr_prob_path):
    """Cached-factorization re-solve against a perturbed RHS (multi-RHS mode,
    ref nddata.h:72-75) matches a from-scratch solve."""
    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    fact, rhs = jax.jit(rslqr_em.factorize_em)(prob)
    sol = rslqr_em.solve_rhs_em(prob, fact, rhs)
    base = rslqr.solve(prob)
    np.testing.assert_allclose(
        np.asarray(sol.kkt_vector()), np.asarray(base.kkt_vector()), atol=1e-9
    )

    prob2 = dataclasses.replace(prob, q=prob.q + 0.1)
    rhs2 = rslqr_em.leaf_rhs_em(prob2)
    sol2 = rslqr_em.solve_rhs_em(prob2, fact, rhs2)
    want = rslqr.solve(prob2)  # same dynamics -> same factorization is valid
    np.testing.assert_allclose(
        np.asarray(sol2.kkt_vector()), np.asarray(want.kkt_vector()), atol=1e-9
    )


def test_em_factorization_diagnostics(lqr_prob_path):
    from rslqr_tpu import diagnostics

    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    sol = rslqr_em.solve_em(prob)
    assert bool(diagnostics.factorization_ok(sol.fact))


def test_em_bf16_factor_storage(lqr_prob_path):
    """Experimental bf16 slab storage (config.factor_dtype): the solve stays
    usable (bounded residual) and iterative refinement recovers full
    accuracy on top of the low-precision factorization."""
    from rslqr_tpu import refine
    from rslqr_tpu.config import config

    prob64, _ = rt.read_lqr_problem_json(lqr_prob_path)
    prob = prob64.astype(jnp.float32)
    old = config.factor_dtype
    config.factor_dtype = "bfloat16"
    try:
        vec = jax.jit(rslqr_em.solve_kkt_em)(prob)
        res = float(rt.kkt_residual(prob64, vec.astype(jnp.float64)))
        assert res < 5.0, res  # bf16 slabs: coarse but bounded (~0.9 here)
        sol = refine.solve_refined(prob64, iterations=3, solve_dtype=jnp.float32)
        res_ref = float(rt.kkt_residual(prob64, sol.kkt_vector()))
        assert res_ref < 1e-6, res_ref  # refinement recovers accuracy
    finally:
        config.factor_dtype = old


def test_em_solve_twice_bitwise(lqr_prob_path):
    """Purity: re-solving gives bitwise-identical output (the reference's
    reset + solve-twice test, nested_dissection_test.c:285-313)."""
    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    f = jax.jit(rslqr_em.solve_kkt_em)
    a, b = f(prob), f(prob)
    assert jnp.array_equal(a, b)


def test_em_bf16_refine_contract_n256(lqr_prob_256_path):
    """The bf16-slab ACCURACY CONTRACT at production depth (VERDICT r2 #7):
    raw bf16 factorization error amplifies over the deep tree (residual
    ~1e+2 at N=256), and iterative refinement on top of the bf16
    factorization still converges to full accuracy. bf16 slabs are only
    supported paired with refine; headline benchmarks exclude them."""
    from rslqr_tpu import refine
    from rslqr_tpu.config import config

    prob64, _ = rt.read_lqr_problem_json(lqr_prob_256_path)
    old = config.factor_dtype
    config.factor_dtype = "bfloat16"
    try:
        sol = refine.solve_refined(
            prob64, iterations=8, solve_dtype=jnp.float32
        )
        res = float(rt.kkt_residual(prob64, sol.kkt_vector()))
        assert res < 1e-8, f"post-refine residual {res}"
    finally:
        config.factor_dtype = old

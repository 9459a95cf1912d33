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


def test_solve_refined_host_golden_n256(lqr_prob_256_path):
    """The bench accuracy gate's machinery (VERDICT r3 #3): f32 device
    factorization + host numpy f64 residuals reaches the reference's 1e-6
    golden bar (sample_problem_test.c:150-157) with room to spare."""
    import numpy as np

    import rslqr_tpu as rt
    from rslqr_tpu import refine

    prob, golden = rt.read_lqr_problem_json(lqr_prob_256_path, dtype=None)
    assert np.asarray(prob.A).dtype == np.float64  # data stays f64 on host
    kkt, res = refine.solve_refined_host(prob, iterations=3)
    assert res < 1e-9
    assert float(np.max(np.abs(kkt - golden))) < 1e-6

    # Batched: one leading batch axis flows through the same path.
    prob32 = rt.read_lqr_problem_json(lqr_prob_256_path, dtype="float32")[0]
    import jax

    batch = rt.batch_problems(prob32, jax.random.split(jax.random.PRNGKey(0), 3))
    kktb, resb = refine.solve_refined_host(batch, iterations=3)
    assert kktb.shape == (3, prob.nvars)
    assert resb < 1e-4  # f32-rounded data bounds the achievable residual


def test_solve_refined_device_golden_n256(lqr_prob_256_path):
    """Device-resident double-float refinement (round 5): same contract as
    solve_refined_host but with the f64 residual emulated on device as
    (hi, lo) f32 pairs — no per-iteration host round trips. Must beat the
    reference's 1e-6 golden bar with margin."""
    import numpy as np

    import rslqr_tpu as rt
    from rslqr_tpu import refine

    prob, golden = rt.read_lqr_problem_json(lqr_prob_256_path, dtype=None)
    kkt, res = refine.solve_refined_device(prob, iterations=3)
    assert res < 1e-8
    assert float(np.max(np.abs(kkt - golden))) < 1e-8

    # Batched path.
    import jax

    prob32 = rt.read_lqr_problem_json(lqr_prob_256_path, dtype="float32")[0]
    batch = rt.batch_problems(
        prob32, jax.random.split(jax.random.PRNGKey(0), 3)
    )
    kktb, resb = refine.solve_refined_device(batch, iterations=3)
    assert kktb.shape == (3, prob.nvars)
    assert resb < 1e-4


def test_df_arithmetic_primitives():
    """Double-float TwoSum/TwoProd recover f64-level products/sums from f32
    pairs (the basis of the device residual path)."""
    import numpy as np

    from rslqr_tpu.refine import _df_add, _df_mul

    rng = np.random.default_rng(0)
    a64 = rng.standard_normal(1000)
    b64 = rng.standard_normal(1000)
    sp = lambda x: (
        x.astype(np.float32),
        (x - x.astype(np.float32).astype(np.float64)).astype(np.float32),
    )
    import jax.numpy as jnp

    ja = tuple(jnp.asarray(v) for v in sp(a64))
    jb = tuple(jnp.asarray(v) for v in sp(b64))
    s = _df_add(ja, jb)
    p = _df_mul(ja, jb)
    s64 = np.asarray(s[0], np.float64) + np.asarray(s[1], np.float64)
    p64 = np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)
    np.testing.assert_allclose(s64, a64 + b64, rtol=1e-14, atol=1e-14)
    np.testing.assert_allclose(p64, a64 * b64, rtol=1e-13, atol=1e-13)


def test_refined_kkt_device_jittable(lqr_prob_256_path):
    """refined_kkt_device (round 5): the fully-jittable serving entry —
    packed (hi, lo) device KKT arrays whose sum solves the stored (f32)
    problem to double-float accuracy, with no host round trips inside."""
    import jax
    import numpy as np

    import rslqr_tpu as rt
    from rslqr_tpu import refine

    prob32 = rt.read_lqr_problem_json(lqr_prob_256_path, dtype="float32")[0]
    batch = rt.batch_problems(
        prob32, jax.random.split(jax.random.PRNGKey(0), 3)
    )
    hi, lo, res = refine.refined_kkt_device(batch, iterations=3)
    assert hi.shape == (3, prob32.nvars)
    kkt = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    # Residual of the f32-stored problem at the df solution: ~1e-9 level.
    p64 = jax.tree.map(lambda x: np.asarray(x, np.float64), batch)
    for i in range(3):
        pi = jax.tree.map(lambda x: x[i], p64)
        assert float(rt.kkt_residual(pi, kkt[i])) < 1e-6
    assert float(res) < 1e-4

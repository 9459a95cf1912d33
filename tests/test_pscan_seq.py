"""Horizon-sharded pscan tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rslqr_tpu import io, problem, pscan
from rslqr_tpu.parallel import make_mesh
from rslqr_tpu.parallel.pscan_seq import solve_pscan_sharded

needs_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@needs_devices
@pytest.mark.parametrize("n_sp", [1, 2, 4])
def test_pscan_sharded_matches_serial_n8(n_sp, lqr_prob_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_path)
    mesh = make_mesh((n_sp,), ("sp",), jax.devices()[:n_sp])
    out = solve_pscan_sharded(prob, mesh, "sp")
    err = np.max(np.abs(np.asarray(out) - soln))
    assert err < 1e-6, f"sp={n_sp}: parity error {err}"
    # Bit-level parity target: single-device pscan on the same problem.
    ref = pscan.solve_pscan_kkt(prob)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


@needs_devices
def test_pscan_sharded_matches_serial_n256():
    prob, soln = io.read_lqr_problem_json("/root/reference/lqr_prob_256.json")
    mesh = make_mesh((8,), ("sp",), jax.devices()[:8])
    out = solve_pscan_sharded(prob, mesh, "sp")
    err = np.max(np.abs(np.asarray(out) - soln))
    assert err < 1e-6, f"parity error {err}"


@needs_devices
def test_pscan_sharded_batched_2d_mesh(lqr_prob_path):
    """dp x sp mesh: batch and horizon sharded simultaneously."""
    prob, _ = io.read_lqr_problem_json(lqr_prob_path)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = problem.batch_problems(prob, keys)
    mesh = make_mesh((2, 4), ("dp", "sp"), jax.devices()[:8])
    out = solve_pscan_sharded(batch, mesh, "sp", "dp")
    ref = pscan.solve_pscan_kkt(batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-9)


@needs_devices
def test_pscan_sharded_random():
    prob = problem.random_problem(jax.random.PRNGKey(5), 64, 4, 2, jnp.float64)
    mesh = make_mesh((4,), ("sp",), jax.devices()[:4])
    out = solve_pscan_sharded(prob, mesh, "sp")
    res = problem.kkt_residual(prob, out)
    assert float(res) < 1e-7

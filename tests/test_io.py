"""JSON loader tests, mirroring the reference's lqrdata_test.c / utils_test.c."""

import numpy as np
import pytest

from rslqr_tpu import io


def test_read_lqr_data(lqr_data_path):
    # ref lqrdata_test.c:15-39: known double-integrator structure
    kd = io.read_lqr_data_json(lqr_data_path)
    n, m = kd["nstates"], kd["ninputs"]
    assert (n, m) == (6, 3)
    assert kd["Q"].shape == (n,)
    assert kd["R"].shape == (m,)
    assert kd["A"].shape == (n, n)
    assert kd["B"].shape == (n, m)
    # Double integrator: A has dt=0.1 coupling block, identity diagonal.
    np.testing.assert_allclose(np.diag(kd["A"]), 1.0)
    # B couples inputs with dt^2/2 = 0.005 and dt = 0.1 entries.
    assert np.isclose(sorted(set(np.round(kd["B"].ravel(), 6)))[-1], 0.1)


def test_read_problem_n8(lqr_prob_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_path)
    assert prob.nhorizon == 8
    assert prob.nstates == 6
    assert prob.ninputs == 3
    # ref solver_test.c:20: nvars == 117 for (6, 3, 8)
    assert prob.nvars == 117
    assert soln is not None and soln.shape == (117,)
    np.testing.assert_allclose(np.asarray(prob.x0), [1, -1, 2, -2, 3, -3])
    prob.validate()


def test_read_problem_n256(lqr_prob_256_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_256_path)
    assert prob.nhorizon == 256
    assert prob.nvars == (2 * 6 + 3) * 256 - 3
    assert soln is not None and soln.shape == (prob.nvars,)


def test_round_trip(tmp_path, lqr_prob_path):
    prob, soln = io.read_lqr_problem_json(lqr_prob_path)
    out = tmp_path / "rt.json"
    io.write_lqr_problem_json(str(out), prob, soln)
    prob2, soln2 = io.read_lqr_problem_json(str(out))
    for name in ("A", "B", "f", "Qdiag", "Rdiag", "q", "r", "c", "x0"):
        np.testing.assert_array_equal(
            np.asarray(getattr(prob, name)), np.asarray(getattr(prob2, name))
        )
    np.testing.assert_array_equal(soln, soln2)


def test_named_matrix(sample_problem_path):
    # ref json_utils.c:311-348 / nested_dissection_test.c golden blocks
    b = io.read_named_matrix(sample_problem_path, "soln")
    assert b.shape == (117,)
    F = io.read_named_matrix(sample_problem_path, "F32y")
    assert F.shape == (6, 6)
    # Golden value spot check from the file (column-major decode: the first
    # outer JSON list is column 0, so its 4th entry lands at F[3, 0]).
    assert np.isclose(F[0, 0], -0.9781585235353093)
    assert np.isclose(F[3, 0], 0.021507904980824395)
    assert np.isclose(F[0, 3], 0.060378034093219096)

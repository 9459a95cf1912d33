"""Utility + profile API tests (ref utils_test.c / profile printers)."""

import pytest

from rslqr_tpu import utils
from rslqr_tpu.profile import SolveProfile, print_solve_summary


def test_power_of_two_predicates():
    # ref utils.c:7-15
    assert utils.is_power_of_two(1)
    assert utils.is_power_of_two(8)
    assert not utils.is_power_of_two(0)
    assert not utils.is_power_of_two(6)
    assert not utils.is_power_of_two(-8)
    assert utils.power_of_two(5) == 32
    assert utils.log2_int(256) == 8
    with pytest.raises(ValueError):
        utils.log2_int(6)


def test_profile_print_and_compare(capsys):
    a = SolveProfile(t_total_ms=10.0, t_leaves_ms=2.0, num_devices=1)
    b = SolveProfile(t_total_ms=5.0, t_leaves_ms=1.0, num_devices=8)
    a.print()
    a.compare(b)
    out = capsys.readouterr().out
    assert "Solve Total" in out and "2.00 speedup" in out
    c = a.copy()
    c.reset()
    assert c.t_total_ms == 0.0 and a.t_total_ms == 10.0


def test_solve_summary(capsys):
    print_solve_summary(1.25, num_devices=4, backend="cpu")
    out = capsys.readouterr().out
    assert "Solve time" in out and "4 device" in out


def test_profile_solve_populates_all_five_phases(lqr_prob_path):
    """All five reference phases (solver.h:31-39) get nonzero times and the
    fused total is measured — the meaningful five-row A/B of
    ndlqr_CompareProfile (solver.c:49-58) requires every row populated."""
    import rslqr_tpu as rt
    from rslqr_tpu.profile import profile_solve

    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    p = profile_solve(prob, repeats=1)
    assert p.t_total_ms > 0
    assert p.t_leaves_ms > 0
    assert p.t_products_ms > 0
    assert p.t_cholesky_ms > 0
    assert p.t_cholsolve_ms > 0
    assert p.t_shur_ms > 0
    p.compare(p)  # five-row A/B printout runs


def test_profile_riccati_pass_times(lqr_prob_path, capsys):
    """Riccati backward/forward are timed separately
    (ref riccati_solve.c:16-22, summary riccati_solver.c:155-165)."""
    import rslqr_tpu as rt
    from rslqr_tpu.profile import profile_riccati

    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    p = profile_riccati(prob, repeats=1)
    assert p.t_backward_pass_ms > 0
    assert p.t_forward_pass_ms > 0
    assert p.t_solve_ms > 0
    p.print()
    out = capsys.readouterr().out
    assert "Backward pass" in out and "%" in out


def test_solve_summary_roofline(lqr_prob_path, capsys):
    """With a problem attached, the summary prints the linalg share as
    achieved-vs-roofline (the solver.c:202-205 '% of total' analogue)."""
    import rslqr_tpu as rt
    from rslqr_tpu.profile import print_solve_summary

    prob, _ = rt.read_lqr_problem_json(lqr_prob_path)
    print_solve_summary(1.25, num_devices=1, backend="cpu", problem=prob)
    out = capsys.readouterr().out
    assert "GFLOP/s" in out and "roofline" in out


def test_linalg_flop_estimate():
    from rslqr_tpu.profile import linalg_flop_estimate

    est = linalg_flop_estimate(6, 3, 256)
    assert est["flops_total"] > 0
    assert est["flops_shur"] > est["flops_cholesky"]  # Schur updates dominate
    assert 0 < est["arithmetic_intensity"] < 10  # memory-bound regime

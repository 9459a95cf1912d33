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


def test_linalg_flop_estimate():
    from rslqr_tpu.profile import linalg_flop_estimate

    est = linalg_flop_estimate(6, 3, 256)
    assert est["flops_total"] > 0
    assert est["flops_shur"] > est["flops_cholesky"]  # Schur updates dominate
    assert 0 < est["arithmetic_intensity"] < 10  # memory-bound regime

"""Native host-runtime extension tests (C++ JSON loader + tree tables)."""

import numpy as np
import pytest

from rslqr_tpu import io, native, tree

pytestmark = pytest.mark.skipif(
    not native.have_native(),
    reason="_rslqr_native not built (python setup.py build_ext --inplace)",
)


def test_native_loader_matches_python(lqr_prob_path):
    fields, soln = native.load_problem_native(lqr_prob_path)
    prob, soln_py = io.read_lqr_problem_json(lqr_prob_path)
    for k, v in fields.items():
        np.testing.assert_array_equal(v, np.asarray(getattr(prob, k)), err_msg=k)
    np.testing.assert_array_equal(soln, soln_py)


def test_native_loader_n256(lqr_prob_256_path):
    fields, soln = native.load_problem_native(lqr_prob_256_path)
    prob, soln_py = io.read_lqr_problem_json(lqr_prob_256_path)
    np.testing.assert_array_equal(fields["A"], np.asarray(prob.A))
    np.testing.assert_array_equal(soln, soln_py)


def test_native_tree_tables():
    for N in (8, 64, 256):
        d, lv, sep, calc = native.tree_tables_native(N)
        t = tree.build_tree_tables(N)
        assert d == t.depth
        np.testing.assert_array_equal(lv, t.levels)
        np.testing.assert_array_equal(sep, t.sep_index)
        np.testing.assert_array_equal(calc, t.calc_lambda)


def test_native_rejects_bad_horizon():
    with pytest.raises(ValueError):
        native.tree_tables_native(6)

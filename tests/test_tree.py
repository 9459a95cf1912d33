"""Tree index-table tests, mirroring the reference's binarytree_test.c."""

import numpy as np
import pytest

from rslqr_tpu import tree


def test_index_level_n8():
    # ref binarytree_test.c:23-34
    expected = [0, 1, 0, 2, 0, 1, 0]
    for idx, lvl in enumerate(expected):
        assert tree.index_level(idx) == lvl


def test_index_from_leaf():
    # ref binary_tree.c:65-69: index = 2^level (2 leaf + 1) - 1
    assert tree.index_from_leaf(0, 0) == 0
    assert tree.index_from_leaf(1, 0) == 2
    assert tree.index_from_leaf(0, 1) == 1
    assert tree.index_from_leaf(1, 1) == 5
    assert tree.index_from_leaf(0, 2) == 3


def test_index_at_level_n8():
    # ref binarytree_test.c:36-61
    assert tree.index_at_level(5, 0, 8) == 4
    assert tree.index_at_level(3, 0, 8) == 2
    assert tree.index_at_level(2, 2, 8) == 3
    assert tree.index_at_level(7, 2, 8) == 3
    assert tree.index_at_level(7, 0, 8) == 6


def test_tables_n8():
    t = tree.build_tree_tables(8)
    assert t.depth == 3
    np.testing.assert_array_equal(t.levels, [0, 1, 0, 2, 0, 1, 0])
    np.testing.assert_array_equal(t.leaf_index[0], [0, 2, 4, 6])
    np.testing.assert_array_equal(t.leaf_index[1], [1, 5])
    np.testing.assert_array_equal(t.leaf_index[2], [3])
    # Root (level 2) covers all knots; its left range starts at 0, right at 4.
    np.testing.assert_array_equal(t.sep_index[:, 2], [3] * 8)
    # calc_lambda: start-of-range knots skip lambda except knot 0
    # (ref nested_dissection.c:173-177). Root: left start 0, right start 4.
    np.testing.assert_array_equal(
        t.calc_lambda[:, 2], [True, True, True, True, False, True, True, True]
    )
    # Level 0 node 0 covers knots {0, 1}: both are range starts, knot 0 exempt.
    assert t.calc_lambda[0, 0]
    assert not t.calc_lambda[1, 0]
    assert not t.calc_lambda[2, 0]  # left start of node 2


def test_tables_match_reference_walk():
    """Cross-check the closed-form tables against a literal tree walk."""
    for N in (2, 4, 8, 16, 64, 256):
        t = tree.build_tree_tables(N)
        for k in range(N):
            for L in range(t.depth):
                idx = t.sep_index[k, L]
                assert tree.index_level(int(idx)) == L
                lo = idx - (1 << L) + 1
                hi = idx + (1 << L)
                kk = min(k, N - 2)
                assert lo <= kk <= hi


def test_solver_inline_masks_match_tables():
    """The solver re-derives the tree's index math inline as reshape/slice
    patterns (rslqr._group/_lambda_mask); prove those equal the TreeTables
    values so there is one source of truth for the trickiest index math
    (ref nested_dissection.c:173-177, binary_tree.c:65-106)."""
    from rslqr_tpu.rslqr import _lambda_mask

    for N in (2, 4, 8, 16, 64, 256, 1024):
        t = tree.build_tree_tables(N)
        for L in range(t.depth):
            span = 1 << (L + 1)
            mid = (1 << L) - 1
            # _group(x, span)[:, mid] picks the level-L separators in leaf
            # order: group g's separator is knot g*span + mid.
            sep_from_group = np.arange(N // span) * span + mid
            np.testing.assert_array_equal(sep_from_group, t.leaf_index[L])
            # Every knot's sep_index at level L is its own group's separator.
            np.testing.assert_array_equal(
                t.sep_index[:, L],
                np.repeat(sep_from_group, span)[: N],
            )
            # The inline calc_lambda pattern equals the table column.
            mask = _lambda_mask(N, span, mid + 1).reshape(-1)
            np.testing.assert_array_equal(mask, t.calc_lambda[:, L])


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        tree.build_tree_tables(6)
    with pytest.raises(ValueError):
        tree.build_tree_tables(1)

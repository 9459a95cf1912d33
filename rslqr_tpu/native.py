"""Bridge to the native host runtime (``_rslqr_native`` C++ extension).

The TPU compute path is JAX/XLA; the host data path — parsing reference-format
problem JSON (counterpart of src/json_utils.c + vendored cJSON) and building
tree tables (src/binary_tree.c) — has a C++ fast path in ``csrc/`` built via
``python setup.py build_ext --inplace``. Every entry point falls back to the
pure-Python implementation when the extension is absent, so the package works
from a plain checkout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import _rslqr_native as _native
except ImportError:  # pragma: no cover - exercised when extension not built
    _native = None


def have_native() -> bool:
    return _native is not None


def load_problem_native(path: str):
    """Parse a problem file with the C++ loader; None if unavailable.

    Returns ``(dict_of_numpy_arrays, golden_soln_or_None)`` with the same
    field names as :class:`rslqr_tpu.problem.LQRProblem`.
    """
    if _native is None:
        return None
    raw = _native.load_problem(path)
    N, n, m = raw["nhorizon"], raw["nstates"], raw["ninputs"]

    def arr(key, shape):
        return np.frombuffer(raw[key], dtype=np.float64).reshape(shape)

    fields = {
        "A": arr("A", (N, n, n)),
        "B": arr("B", (N, n, m)),
        "f": arr("f", (N, n)),
        "Qdiag": arr("Qdiag", (N, n)),
        "Rdiag": arr("Rdiag", (N, m)),
        "q": arr("q", (N, n)),
        "r": arr("r", (N, m)),
        "c": arr("c", (N,)),
        "x0": arr("x0", (n,)),
    }
    soln = (
        np.frombuffer(raw["soln"], dtype=np.float64) if "soln" in raw else None
    )
    return fields, soln


def tree_tables_native(nhorizon: int):
    """Tree tables from the C++ builder; None if unavailable."""
    if _native is None:
        return None
    raw = _native.tree_tables(nhorizon)
    depth = raw["depth"]
    levels = np.frombuffer(raw["levels"], dtype=np.int32)
    sep = np.frombuffer(raw["sep_index"], dtype=np.int32).reshape(nhorizon, depth)
    calc = np.frombuffer(raw["calc_lambda"], dtype=np.uint8).reshape(
        nhorizon, depth
    ).astype(bool)
    return depth, levels, sep, calc

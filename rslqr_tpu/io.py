"""JSON problem/golden-data loaders matching the reference file formats.

TPU-native counterpart of ``src/json_utils.{h,c}``. The reference formats
(documented in json_utils.h:24-66) were generated from a Julia implementation,
so:

  * knot ``index`` fields are 1-based (json_utils.c:237 subtracts 1);
  * 2D arrays are stored column-major — the outer JSON list enumerates
    *columns* (json_utils.c:87-126).

Loading happens on the host with NumPy; the result is packed into the stacked
:class:`~rslqr_tpu.problem.LQRProblem` pytree.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .problem import LQRProblem, problem_from_arrays


def _read_matrix_colmajor(obj) -> np.ndarray:
    """Decode a reference-format 2D array: outer list = columns."""
    return np.asarray(obj, dtype=np.float64).T


def read_lqr_data_json(path: str) -> Dict[str, np.ndarray]:
    """Load a single knot point file (format: json_utils.h:24-44).

    Returns a dict with keys Q, R, q, r, c, A, B, d plus nstates/ninputs.
    Counterpart of ``ndlqr_ReadLQRDataJSONFile`` (json_utils.c:136-184).
    """
    with open(path) as fh:
        obj = json.load(fh)
    return _decode_knot(obj)


def _decode_knot(obj) -> Dict[str, np.ndarray]:
    out = {
        "nstates": int(obj["nstates"]),
        "ninputs": int(obj["ninputs"]),
        "Q": np.asarray(obj["Q"], dtype=np.float64),
        "R": np.asarray(obj["R"], dtype=np.float64),
        "q": np.asarray(obj["q"], dtype=np.float64),
        "r": np.asarray(obj["r"], dtype=np.float64),
        "c": float(obj["c"]),
        "A": _read_matrix_colmajor(obj["A"]),
        "B": _read_matrix_colmajor(obj["B"]),
        "d": np.asarray(obj["d"], dtype=np.float64),
    }
    return out


def read_lqr_problem_json(
    path: str, dtype=jnp.float64
) -> Tuple[LQRProblem, Optional[np.ndarray]]:
    """Load a full LQR problem file (format: json_utils.h:46-66).

    Counterpart of ``ndlqr_ReadLQRProblemJSONFile`` (json_utils.c:186-259).
    Returns ``(problem, golden_solution_or_None)`` — the shipped problem files
    carry a ``soln`` KKT vector produced by the Julia generator, used as the
    parity oracle by the reference tests (test/sample_problem_test.c:150-151).
    """
    with open(path) as fh:
        obj = json.load(fh)
    N = int(obj["nhorizon"])
    x0 = np.asarray(obj["x0"], dtype=np.float64)
    knots = [None] * N
    for entry in obj["lqrdata"]:
        k = int(entry["index"]) - 1  # 1-based Julia indices (json_utils.c:237)
        knots[k] = _decode_knot(entry)
    if any(kd is None for kd in knots):
        raise ValueError(f"{path}: missing knot points")
    n = knots[0]["nstates"]
    m = knots[0]["ninputs"]

    def stack(key, shape):
        return np.stack([kd[key].reshape(shape) for kd in knots])

    arrays = dict(
        A=stack("A", (n, n)),
        B=stack("B", (n, m)),
        f=stack("d", (n,)),
        Qdiag=stack("Q", (n,)),
        Rdiag=stack("R", (m,)),
        q=stack("q", (n,)),
        r=stack("r", (m,)),
        c=np.array([kd["c"] for kd in knots]),
        x0=x0,
    )
    if dtype is None:
        # Full-precision numpy problem: float64 data WITHOUT requiring jax
        # x64 mode — the input to refine.solve_refined_host on TPU, where
        # the residuals are evaluated host-side in numpy float64.
        from .problem import LQRProblem

        prob = LQRProblem(**arrays)
        prob.validate()
    else:
        prob = problem_from_arrays(**arrays).astype(dtype)
    soln = None
    if "soln" in obj:
        # The Julia generator writes the solution as a 1-column matrix.
        soln = np.asarray(obj["soln"], dtype=np.float64).reshape(-1)
    return prob, soln


def read_named_matrix(path: str, name: str) -> np.ndarray:
    """Load one named matrix from a golden-data file, column-major.

    Counterpart of ``ReadMatrixJSONFile`` (json_utils.c:311-348), used by the
    reference's nested-dissection tests to fetch intermediate factor blocks
    (``F{knot}{level}{y|x|u}``, ``b``, ``soln``) from sample_problem.json.
    """
    with open(path) as fh:
        obj = json.load(fh)
    val = obj[name]
    arr = np.asarray(val, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr.T
        if 1 in arr.shape:  # column vectors flatten for convenience
            arr = arr.reshape(-1)
    return arr


def read_all_named_matrices(path: str) -> Dict[str, np.ndarray]:
    """Load every named matrix in a golden-data file (column-major decode)."""
    with open(path) as fh:
        obj = json.load(fh)
    out = {}
    for name, val in obj.items():
        arr = np.asarray(val, dtype=np.float64)
        if arr.ndim == 2:
            arr = arr.T
            if 1 in arr.shape:
                arr = arr.reshape(-1)
        out[name] = arr
    return out


def write_lqr_problem_json(path: str, prob: LQRProblem, soln=None) -> None:
    """Serialize a problem back to the reference JSON format (round-trip)."""
    N, n, m = prob.nhorizon, prob.nstates, prob.ninputs
    P = {k: np.asarray(v, dtype=np.float64) for k, v in (
        ("A", prob.A), ("B", prob.B), ("f", prob.f), ("Q", prob.Qdiag),
        ("R", prob.Rdiag), ("q", prob.q), ("r", prob.r), ("c", prob.c),
        ("x0", prob.x0))}
    lqrdata = []
    for k in range(N):
        lqrdata.append(
            {
                "index": k + 1,
                "nstates": n,
                "ninputs": m,
                "Q": P["Q"][k].tolist(),
                "R": P["R"][k].tolist(),
                "q": P["q"][k].tolist(),
                "r": P["r"][k].tolist(),
                "c": float(P["c"][k]),
                "A": P["A"][k].T.tolist(),  # column-major on disk
                "B": P["B"][k].T.tolist(),
                "d": P["f"][k].tolist(),
            }
        )
    obj = {"nhorizon": N, "x0": P["x0"].tolist(), "lqrdata": lqrdata}
    if soln is not None:
        obj["soln"] = np.asarray(soln, dtype=np.float64).tolist()
    with open(path, "w") as fh:
        json.dump(obj, fh)

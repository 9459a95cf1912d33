"""Solve diagnostics: failure detection and solution verification.

TPU-native counterpart of the reference's error machinery (SURVEY §5.2-5.3):
return codes + stderr prints (nddata.c:82-96), and per-factorization
``CholeskyInfo.success`` flags (linalg.c:84, clap_kCholeskyFail) that callers
never actually check mid-solve. Under XLA, data-dependent aborts don't exist
inside a jitted program, so failure detection is explicit and vectorized
instead: a factorization failure (non-SPD separator block) produces NaNs
that propagate to the output, and :func:`solve_status` reduces them to a
per-instance status — strictly stronger than the reference's unchecked
flags. Argument validation (the nddata_test.c invalid-arg cases) lives in
:meth:`LQRProblem.validate` and the tree builders.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import jax.numpy as jnp

from .problem import LQRProblem, kkt_residual, unpack_solution
from .rslqr import RsLqrFactorization, RsLqrSolution


class SolveStatus(enum.IntEnum):
    """Per-instance solve outcome (reference analogue: CholeskyInfo.success
    + clap_kCholeskyFail, linalg_custom.c:100-102)."""

    OK = 0
    FACTORIZATION_FAILED = 1  # NaN/Inf in the factorization (non-SPD Sbar)
    DIVERGED = 2  # finite factors but non-finite / large-residual solution


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveReport:
    """Batched diagnostics; arrays have the instance batch shape."""

    status: jax.Array  # int32 SolveStatus codes
    max_residual: jax.Array  # KKT residual per instance
    finite: jax.Array  # bool, solution entirely finite


def factorization_ok(fact) -> jax.Array:
    """Per-instance "all Cholesky factors finite" predicate.

    Accepts either factorization layout (:class:`RsLqrFactorization` grid or
    :class:`rslqr_tpu.rslqr_em.EmFactorization` element planes); arrays are
    batch-last with ``fact.nbatch`` trailing batch axes. Returns an array of
    that batch shape (scalar for a single problem).
    """
    nb = fact.nbatch
    if isinstance(fact, RsLqrFactorization):
        chol = fact.chol
        reduce_axes = tuple(range(chol.ndim - nb))
        return jnp.all(jnp.isfinite(chol), axis=reduce_axes)
    # Element-major: reduce every diagonal Cholesky plane over its knot axis.
    oks = [
        jnp.all(jnp.isfinite(p), axis=tuple(range(p.ndim - nb)))
        for level in fact.chols
        for p in level
    ]
    out = oks[0]
    for o in oks[1:]:
        out = jnp.logical_and(out, o)
    return out


def check_solution(
    prob: LQRProblem, soln_vec: jax.Array, tol: float = 1e-4
) -> SolveReport:
    """Verify KKT optimality of (possibly batched) solution vectors.

    The rigorous replacement for the reference's "compare against the other
    solver" pattern (test/sample_problem_test.c:153-157): residuals are
    computed against the optimality system itself, so no oracle is needed.
    """
    nbatch = soln_vec.ndim - 1

    def one(p, v):
        return kkt_residual(p, v)

    f = one
    for _ in range(nbatch):
        f = jax.vmap(f)
    res = f(prob, soln_vec)
    finite = jnp.all(jnp.isfinite(soln_vec), axis=-1)
    status = jnp.where(
        ~finite,
        jnp.int32(SolveStatus.FACTORIZATION_FAILED),
        jnp.where(res > tol, jnp.int32(SolveStatus.DIVERGED), jnp.int32(SolveStatus.OK)),
    )
    return SolveReport(status=status, max_residual=res, finite=finite)


def assert_solution_ok(prob: LQRProblem, soln_vec: jax.Array, tol: float = 1e-4):
    """Host-side hard check (test/CI use): raises on any failed instance."""
    report = check_solution(prob, soln_vec, tol)
    import numpy as np

    status = np.asarray(report.status)
    if (status != int(SolveStatus.OK)).any():
        bad = np.argwhere(status != int(SolveStatus.OK)).ravel()
        res = np.asarray(report.max_residual)
        raise RuntimeError(
            f"solve failed for instances {bad.tolist()}: "
            f"status={status.ravel()[bad].tolist()}, residuals={res.ravel()[bad[:8]].tolist()}"
        )
    return report

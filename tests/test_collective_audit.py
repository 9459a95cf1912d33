"""Machine-checkable audit of the sharded solvers' communication structure.

VERDICT r3 #4: the multi-chip design claims (a) only the top ``log2(D)``
tree levels communicate — bottom levels are device-local, mirroring the
reference's disjoint static work ranges (solve.c:27-36) — and (b) the
communication volume is O(D * log D * n^2 * b_local), independent of the
horizon length N. Scaling-efficiency numbers on the emulated CPU mesh are
meaningless (SCALING artifacts say so), but these *structural* claims are
checkable without hardware: walk the traced jaxpr, collect every collective
primitive with its output aval, and compare against the closed-form model
derived from the design (parallel/seq.py, parallel/pscan_seq.py module
docstrings).
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import rslqr_tpu as rt
from rslqr_tpu.parallel import solve_pscan_sharded, solve_seq_sharded

COLLECTIVES = {
    "all_gather",
    "ppermute",
    "psum",
    "all_to_all",
    "reduce_scatter",
    "pmin",
    "pmax",
}


def _walk(jaxpr, acc):
    """Recursively collect (primitive_name, out_shapes) for collectives."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in COLLECTIVES:
            acc.append(
                (eqn.primitive.name, tuple(v.aval.shape for v in eqn.outvars))
            )
        for val in eqn.params.values():
            for sub in val if isinstance(val, (list, tuple)) else (val,):
                inner = getattr(sub, "jaxpr", None)
                if inner is not None:  # ClosedJaxpr
                    _walk(inner, acc)
                elif hasattr(sub, "eqns"):  # raw Jaxpr
                    _walk(sub, acc)


def collective_audit(fn, *args):
    """All collective primitives in ``fn``'s jaxpr with their output shapes."""
    acc = []
    _walk(jax.make_jaxpr(fn)(*args).jaxpr, acc)
    return acc


def _mesh(D):
    devs = jax.devices()
    if len(devs) < D:
        pytest.skip(f"need {D} virtual devices")
    return Mesh(np.array(devs[:D]), ("sp",))


def _prob(N, n=6, m=3):
    return rt.random_problem(jax.random.PRNGKey(0), N, n, m, jnp.float64)


def _seq_expected(D, N, n, m):
    """The design's exact collective signature for solve_seq_sharded.

    Per the top-level exchange in parallel/seq.py: two dynamics gathers,
    then per top level (T = log2 D of them, upper count U = T..1): four
    factor-block gathers in the sweep and four vector gathers in the RHS
    pass. Every gathered array is O(1) blocks per device — never a knot-
    axis slab — which IS the "only boundary blocks cross devices" claim.
    """
    T = int(np.log2(D))
    shapes = collections.Counter()
    shapes[("all_gather", (D, n, n))] += 1  # A_last
    shapes[("all_gather", (D, n, m))] += 1  # B_last
    for U in range(T, 0, -1):
        shapes[("all_gather", (D, U, n, n))] += 3  # lasts_x, firsts_x/_l
        shapes[("all_gather", (D, U, m, n))] += 1  # lasts_u
    shapes[("all_gather", (D, n))] += 3 * T  # last_zx, first_zx, first_zy
    shapes[("all_gather", (D, m))] += T  # last_zu
    return shapes


def _pscan_expected(D, N, n, m):
    """Design signature for solve_pscan_sharded: one gather of the five
    chunk-reduced element components, one gather of the two chunk affine-map
    components, one ppermute pair for the gain boundary — all O(1) blocks
    per device, independent of N."""
    shapes = collections.Counter()
    shapes[("all_gather", (D, n, n))] += 3 + 1  # F, C, J; forward map M
    shapes[("all_gather", (D, n))] += 2 + 1  # c, eta; forward map t
    shapes[("ppermute", (n, n))] += 1  # next chunk's P[0]
    shapes[("ppermute", (n,))] += 1  # next chunk's p[0]
    return shapes


def _signature(audit):
    sig = collections.Counter()
    for name, outs in audit:
        for s in outs:
            sig[(name, s)] += 1
    return sig


@pytest.mark.parametrize("D", [2, 4, 8])
def test_seq_collective_signature(D):
    mesh = _mesh(D)
    N, n, m = 32, 6, 3
    audit = collective_audit(
        lambda p: solve_seq_sharded(p, mesh), _prob(N, n, m)
    )
    assert _signature(audit) == _seq_expected(D, N, n, m)


@pytest.mark.parametrize("D", [2, 4, 8])
def test_pscan_collective_signature(D):
    mesh = _mesh(D)
    N, n, m = 32, 6, 3
    audit = collective_audit(
        lambda p: solve_pscan_sharded(p, mesh), _prob(N, n, m)
    )
    assert _signature(audit) == _pscan_expected(D, N, n, m)


@pytest.mark.parametrize(
    "solver", [solve_seq_sharded, solve_pscan_sharded]
)
def test_volume_independent_of_horizon(solver):
    """Doubling N must not change the communication signature at all —
    the per-solve volume is O(D log D n^2 b_local), not O(N)."""
    mesh = _mesh(4)
    sig32 = _signature(
        collective_audit(lambda p: solver(p, mesh), _prob(32))
    )
    sig64 = _signature(
        collective_audit(lambda p: solver(p, mesh), _prob(64))
    )
    assert sig32 == sig64
    assert sum(sig32.values()) > 0  # the audit actually saw the collectives


def test_seq_volume_matches_model():
    """Total gathered bytes == the closed-form O(D log D (n^2+nm) b) model
    (f64 test dtype; nb = 0 so b_local = 1)."""
    D, N, n, m = 8, 64, 6, 3
    mesh = _mesh(D)
    audit = collective_audit(
        lambda p: solve_seq_sharded(p, mesh), _prob(N, n, m)
    )
    got = sum(
        int(np.prod(s)) * 8
        for name, outs in audit
        for s in outs
        if name == "all_gather"
    )
    T = int(np.log2(D))
    model = 8 * D * (
        n * n + n * m
        + sum(U * (3 * n * n + m * n) for U in range(1, T + 1))
        + T * (3 * n + m)
    )
    assert got == model

"""Config staleness contract + SolveOptions (VERDICT r2 weak #3).

The hazard: config.layout / pallas / factor_dtype are read at trace time, so
a user holding an already-jitted solve could silently keep executing a stale
compiled path after flipping the config. The contract (config.py docstring):
mutating any config field clears jax's jit caches, so the flip *takes
effect* on the next call of even an already-held jitted function; explicit
SolveOptions give per-call control with no global state at all.
"""

import jax
import jax.numpy as jnp
import pytest

import rslqr_tpu as rt
from rslqr_tpu import rslqr, rslqr_em
from rslqr_tpu.config import SolveOptions, config


@pytest.fixture
def small_batch():
    prob = rt.double_integrator_problem(8, dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    return rt.batch_problems(prob, keys)


def test_config_flip_invalidates_held_jit(small_batch):
    """A held jitted factorize re-traces after config.factor_dtype flips."""
    held = jax.jit(lambda p: rslqr_em.factorize_em(p)[0].Fls[0])
    old = config.factor_dtype
    try:
        config.factor_dtype = ""
        assert held(small_batch).dtype == jnp.float64
        config.factor_dtype = "bfloat16"
        # Same jitted callable: the mutation must not silently reuse the
        # cached f64-slab program.
        assert held(small_batch).dtype == jnp.bfloat16
    finally:
        config.factor_dtype = old


def test_config_layout_flip_changes_dispatch(small_batch):
    """solve() under a held jit follows layout flips (em <-> grid facts)."""
    # The fact's pytree TYPE is resolved at trace time -> a stale cache
    # would keep returning the old structure.
    held = jax.jit(lambda p: rslqr.solve(p).fact)
    old = config.layout
    try:
        config.layout = "em"
        em_fact = held(small_batch)
        assert type(em_fact).__name__ == "EmFactorization"
        config.layout = "grid"
        grid_fact = held(small_batch)
        assert type(grid_fact).__name__ == "RsLqrFactorization"
    finally:
        config.layout = old


def test_explicit_options_no_global_state(small_batch):
    """SolveOptions pins the path per call, independent of the config."""
    opts_bf16 = SolveOptions(factor_dtype="bfloat16")
    fact, _ = rslqr_em.factorize_em(small_batch, options=opts_bf16)
    assert fact.Fls[0].dtype == jnp.bfloat16
    assert config.factor_dtype == ""  # global untouched

    # Static-argname jit: two options values = two compiled programs.
    import functools

    f = jax.jit(
        functools.partial(rslqr_em.solve_kkt_em),
        static_argnames=("options",),
    )
    out_a = f(small_batch, options=SolveOptions())
    out_b = f(small_batch, options=opts_bf16)
    assert out_a.dtype == out_b.dtype  # solution stays problem dtype
    ref = rslqr_em.solve_kkt_em(small_batch)
    assert float(jnp.max(jnp.abs(out_a - ref))) < 1e-10


def test_config_validation():
    with pytest.raises(ValueError):
        config.layout = "bogus"
    with pytest.raises(ValueError):
        config.pallas = "bogus"
    with pytest.raises(AttributeError):
        config.no_such_field = 1
    with pytest.raises(ValueError):
        SolveOptions(layout="bogus")


def test_options_snapshot_matches_config():
    old = config.layout
    try:
        config.layout = "grid"
        assert SolveOptions.from_config().layout == "grid"
    finally:
        config.layout = old


def test_options_threading_every_entry_point(small_batch):
    """VERDICT r3 #7: every public entry point accepts per-call SolveOptions
    and produces identical numerics with no global config mutation."""
    from jax.sharding import Mesh
    import numpy as np

    from rslqr_tpu import pscan, refine
    from rslqr_tpu.parallel import solve_pscan_sharded, solve_seq_sharded

    ref_rslqr = rslqr.solve_kkt(small_batch)
    ref_pscan = pscan.solve_pscan_kkt(small_batch)

    # Flip layout / threshold per call on each entry point. threshold=2
    # pushes the n=2 double-integrator blocks... n=6 blocks onto the
    # MXU/blocked branch of every linalg dispatch (a different lowering,
    # same numerics).
    opts = SolveOptions(layout="grid", mxu_block_threshold=2)
    out = rslqr.solve_kkt(small_batch, options=opts)
    assert float(jnp.max(jnp.abs(out - ref_rslqr))) < 1e-8

    out = pscan.solve_pscan_kkt(small_batch, options=opts)
    assert float(jnp.max(jnp.abs(out - ref_pscan))) < 1e-8

    # refine starts from an f32 factorization: one iteration leaves O(1e-9)
    # relative error on this O(1e3)-magnitude solution.
    sol = refine.solve_refined(small_batch, iterations=2, options=opts)
    scale = float(jnp.max(jnp.abs(ref_rslqr)))
    assert (
        float(jnp.max(jnp.abs(sol.kkt_vector() - ref_rslqr))) < 1e-8 * scale
    )

    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    out = solve_seq_sharded(small_batch, mesh, options=opts)
    assert float(jnp.max(jnp.abs(out - ref_rslqr))) < 1e-8
    out = solve_pscan_sharded(small_batch, mesh, options=opts)
    assert float(jnp.max(jnp.abs(out - ref_pscan))) < 1e-8

    # No global state was touched by any of the per-call options.
    assert config.mxu_block_threshold == 8
    assert config.layout == "auto"


def test_pscan_options_layout_forces_batch_last():
    """pscan layout='grid' pins the batch-last path for mid-size blocks
    (the vmap re-route is 'auto'-only), with identical numerics."""
    prob = rt.random_problem(jax.random.PRNGKey(3), 8, 12, 4, jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    batch = rt.batch_problems(prob, keys)
    from rslqr_tpu import pscan

    a = pscan.solve_pscan_kkt(batch)  # auto -> vmap mat-last path
    b = pscan.solve_pscan_kkt(batch, options=SolveOptions(layout="grid"))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-8

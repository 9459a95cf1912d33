"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The parity gates inherited from the reference (1e-10 Riccati, 1e-6 rsLQR —
see SURVEY.md §4) require float64, which is emulated and slow on TPU, so the
test suite runs on CPU. Multi-chip sharding tests use the 8 virtual host
devices. Benchmarks (bench.py) run float32 on the real chip instead.
"""

import os

# Force-assign: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax and registers the axon TPU
# plugin before conftest runs, so the env var alone is not enough — pin the
# platform through the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persist compiled programs: the golden N=256 programs dominate suite time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402

REFDIR = "/root/reference"


@pytest.fixture
def no_persistent_cache_write():
    """Compile-safety guard for the quadruped-scale tests.

    The quadruped f64 vmap/MXU programs crash XLA's CPU backend when the
    test process is already large (~16 GB RSS at ~80% of the full suite;
    reproduced in two forms: SIGSEGV inside ``executable.serialize()``
    when writing the persistent cache, and SIGABRT inside
    ``backend_compile_and_load`` itself once serialize was suppressed).
    The same tests pass in isolation at low RSS, so the guard does two
    things before the monster compile:

    1. ``jax.clear_caches()`` + ``gc.collect()``: drop every live
       compiled executable accumulated by the ~140 preceding tests —
       the big cross-module programs are on the persistent disk cache
       and reload quickly where still needed.
    2. Raise ``jax_persistent_cache_min_compile_time_secs`` so the
       crashing serialize path is skipped for this test's programs
       (cache READS still work)."""
    import gc

    jax.clear_caches()
    gc.collect()
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)


@pytest.fixture(scope="session")
def lqr_prob_path():
    return os.path.join(REFDIR, "lqr_prob.json")


@pytest.fixture(scope="session")
def lqr_prob_256_path():
    return os.path.join(REFDIR, "lqr_prob_256.json")


@pytest.fixture(scope="session")
def lqr_data_path():
    return os.path.join(REFDIR, "lqr_data.json")


@pytest.fixture(scope="session")
def sample_problem_path():
    return os.path.join(REFDIR, "sample_problem.json")

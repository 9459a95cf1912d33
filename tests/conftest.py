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
    """Suppress persistent compile-cache WRITES for this test.

    The quadruped-scale f64 vmap/MXU programs segfault inside XLA's CPU
    ``executable.serialize()`` when the test process is already large
    (reproduced twice at ~16 GB RSS during the full-suite run, stack:
    compilation_cache.put_executable_and_time -> executable.serialize();
    the same test passes in isolation, where serialize succeeds at low
    RSS). ``jax_persistent_cache_min_compile_time_secs`` is checked
    BEFORE the serialize call (jax/_src/compiler.py _cache_write), so
    raising it skips the crashing path while cache READS still work —
    warm-cache runs stay fast."""
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

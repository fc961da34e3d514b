"""Test harness: force an 8-device CPU platform for the whole test run.

This is the standard JAX way to exercise multi-device collectives
(shard_map / psum over a Mesh) on a single host without TPU chips —
SURVEY.md §4's test strategy.

Note: this environment's sitecustomize registers a remote 'axon' TPU
backend in every Python process and overrides JAX_PLATFORMS, so setting
the env var alone is NOT enough — tests would silently round-trip every
op over the TPU tunnel (~100× slower). Backends initialize lazily, so
updating jax.config before first device use wins.
"""

import os

# Must precede backend initialization (not merely jax import).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of the tiny-model train/eval steps; repeated runs (the normal
# iteration pattern) hit this disk cache and drop from ~15 min to ~2 min.
# The dir is keyed by the host's CPU feature set: XLA's cache key does
# NOT include machine features, and this container migrates between
# hosts — AOT code compiled on an AVX-512 host loaded on a lesser one
# warns "could lead to SIGILL" on every entry (observed live).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _cpu_id = next(line for line in f if line.startswith("flags"))
except (OSError, StopIteration):
    import platform

    _cpu_id = platform.machine() + platform.processor()
_cpu_tag = hashlib.sha1(_cpu_id.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/zsgnet_jax_cache_{_cpu_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 forced host devices"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run @pytest.mark.slow tests (full-model compiles, fit loops)",
    )


def pytest_collection_modifyitems(config, items):
    """Default runs are the fast iteration gate (~10 min solo, incl. the
    2-process multihost smoke); the nightly / verify pass uses
    ``pytest --runslow`` for everything (VERDICT r1 #8)."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

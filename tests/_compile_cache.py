"""Shared persistent XLA compile-cache setup for the test suite.

Used by tests/conftest.py (the in-process suite) AND
tests/_multihost_worker.py (the 2-process cluster subprocesses — which
previously paid every compile cold on every run, ~4 min of the fast
gate by themselves; VERDICT r4 weak #1).

The cache dir is keyed by the host's CPU feature set: XLA's cache key
does NOT include machine features, and this container migrates between
hosts — AOT code compiled on an AVX-512 host loaded on a lesser one
warns "could lead to SIGILL" on every entry (observed live).
"""

import hashlib


def enable_compile_cache(jax) -> None:
    try:
        with open("/proc/cpuinfo") as f:
            cpu_id = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform

        cpu_id = platform.machine() + platform.processor()
    tag = hashlib.sha1(cpu_id.encode()).hexdigest()[:10]
    jax.config.update("jax_compilation_cache_dir", f"/tmp/zsgnet_jax_cache_{tag}")
    # 0.5 s (was 2.0): the suite compiles many small 8-way-partitioned
    # CPU programs in the 0.5-2 s band — caching them too shaved the
    # measured gate (tracing stays uncached either way).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

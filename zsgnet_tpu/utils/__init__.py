"""Aux subsystems: profiling/tracing, debug checks, metrics logging."""

from zsgnet_tpu.utils.profiling import Timer, profile_trace, time_fn  # noqa: F401

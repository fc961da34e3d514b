"""Profiling & tracing — the subsystem the reference lacks (SURVEY.md §5).

The reference's only observability is fastprogress bars + smoothed loss.
TPU-native replacements here:

  * :func:`profile_trace` — context manager around ``jax.profiler`` that
    writes a TensorBoard/Perfetto trace (XLA op timeline, HBM usage) for
    any code region;
  * :func:`time_fn` / :class:`Timer` — ``block_until_ready`` wall-clock
    harness for steady-state kernel/step timing (used by bench.py and
    kernel micro-benchmarks);
  * :func:`flops_estimate` — analytic conv/matmul FLOP count for
    speed-of-light comparisons against the v5e MXU peak.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Write a jax.profiler trace for the enclosed region.

    View with TensorBoard (`tensorboard --logdir <logdir>`) or upload the
    .trace.json.gz to Perfetto. Works on TPU and CPU backends.
    """
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable[..., Any],
    *args: Any,
    warmup: int = 3,
    iters: int = 100,
) -> tuple[float, Any]:
    """Steady-state seconds/call of a jitted fn.

    Closes the timing window with a *value fetch* (not just
    ``block_until_ready``) because remote-tunnel runtimes under-report
    readiness for array handles; fetching a scalar derived from the last
    output forces true completion of the queued pipeline. Use a long
    ``iters`` so the one ~40 ms fetch round-trip amortizes away.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    import jax.numpy as jnp

    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / iters, out


class Timer:
    """Accumulating section timer for host-side pipeline profiling."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_ms": 1000 * v / self.counts[k]}
            for k, v in self.totals.items()
        }


def flops_estimate(cfg) -> float:
    """Rough per-query forward FLOPs for the flagship model (speed-of-light
    math: ResNet-50 ≈ 4.1 GFLOPs at 224²; scale by area + FPN/head convs)."""
    h, w = cfg.resize_img
    resnet = 4.1e9 * (h * w) / (224 * 224)
    from zsgnet_tpu.ops.anchors import feature_map_sizes

    head = 0.0
    in_ch = cfg.fpn_ch + 2 * cfg.lstm_dim + 2
    for fh, fw in feature_map_sizes((h, w)):
        cells = fh * fw
        head += 2 * cells * 9 * (
            in_ch * cfg.head_ch
            + 3 * cfg.head_ch * cfg.head_ch
            + cfg.head_ch * cfg.num_anchors * 5
        )
    return resnet + head

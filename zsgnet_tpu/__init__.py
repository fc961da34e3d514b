"""zsgnet_tpu — TPU-native zero-shot visual grounding framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the PyTorch
reference ``TheShadow29/zsgnet-pytorch`` (ZSGNet, ICCV 2019 — "Zero-Shot
Grounding of Objects from Natural Language Queries", arXiv:1908.07129).

Design stance (TPU-first, not a port):
  * static shapes everywhere (padded queries + masks, fixed image size,
    fixed anchor count) so the whole train step is ONE jitted XLA program;
  * NHWC conv layout, bfloat16 compute / fp32 params + loss;
  * data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with psum
    gradient reduction over ICI (replaces the reference's DDP/NCCL);
  * hot ops (anchor match + focal loss, box decode, fusion head preamble)
    have a pure-``jax.numpy`` reference implementation and a Pallas TPU
    kernel, selected by config and tested for equality.

Reference layer map: see SURVEY.md §1-§3 at the repo root.
"""

__version__ = "0.1.0"

from zsgnet_tpu.config import Config, get_default_cfg  # noqa: F401

# Lazy top-level API: `from zsgnet_tpu import Grounder` without paying the
# model-stack import (jax tracing utilities, flax) at package import time.
_LAZY = {
    "Grounder": ("zsgnet_tpu.predict", "Grounder"),
    "ExportedGrounder": ("zsgnet_tpu.export", "ExportedGrounder"),
    "export_serving": ("zsgnet_tpu.export", "export_serving"),
    "Learner": ("zsgnet_tpu.train.learner", "Learner"),
    "get_data": ("zsgnet_tpu.data.dataset", "get_data"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'zsgnet_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))

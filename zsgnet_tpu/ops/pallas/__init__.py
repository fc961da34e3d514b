"""Pallas TPU kernels for the grounding hot path.

Every kernel has a pure-jax.numpy reference implementation in
``zsgnet_tpu.ops`` selected via ``cfg.use_pallas`` and tested for
equality (tests/test_pallas.py). Kernels assume float32 loss math
(bf16 focal numerics degrade — SURVEY.md §7).
"""

from zsgnet_tpu.ops.pallas.fused_loss import fused_match_loss  # noqa: F401

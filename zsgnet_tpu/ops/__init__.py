"""Core tensor ops: box geometry, anchor machinery, losses, Pallas kernels."""

from zsgnet_tpu.ops import anchors, boxes, losses  # noqa: F401

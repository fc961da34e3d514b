"""Canvas packing — run the shared fusion head ONCE over all pyramid levels.

The reference evaluates its prediction head in a Python loop, once per
pyramid level (SURVEY.md §3.3). Round 1 kept that structure (5 fused conv
pipelines); this module implements DESIGN.md roadmap #3: pack the five
NHWC level maps into ONE zero-separated spatial canvas and evaluate each
head conv as a single dispatch — 5× fewer conv calls per layer, larger
GEMM M-dimension for the MXU, at the cost of ~1.2× padding FLOPs.

Exactness (equality-tested in tests/test_model.py):

  * levels are separated by a ``gap`` of ≥1 zero cells, so a 3×3 conv tap
    at a level border reads exactly the zeros per-level zero-padding would
    supply;
  * after every conv(+bias+ReLU), the canvas is multiplied by the
    occupancy mask, re-zeroing gap cells (bias/ReLU make them nonzero)
    before the next conv reads them — XLA fuses this into the conv
    epilogue;
  * the language broadcast's border corrections (see
    ``PredictionHead``) use per-level border masks assembled into canvas
    constants, so each level sees its OWN borders, not the canvas's;
  * per-level outputs are static slices of the canvas output — gap cells
    are never read.

Packing is a shelf heuristic: the largest level anchors the left edge,
the rest stack in column shelves to its right. For the 300² retina
pyramid (38,19,10,5,3) this gives a 38×62 canvas = 2356 cells vs 1939
summed (1.22× padding); SSD's (38,19,10,5,3,1) packs to the same canvas.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from zsgnet_tpu.ops import anchors as anchor_ops


@dataclasses.dataclass(frozen=True)
class CanvasLayout:
    """Static canvas geometry: per-level top-left offsets in cell coords."""

    height: int
    width: int
    offsets: tuple[tuple[int, int], ...]  # (row, col) per level
    sizes: tuple[tuple[int, int], ...]  # (h, w) per level


def pack_levels(sizes: Sequence[tuple[int, int]], gap: int = 1) -> CanvasLayout:
    """Shelf-pack pyramid levels into a canvas with ``gap`` zero cells
    between any two levels (gap≥1 suffices for 3×3 convs)."""
    sizes = [(int(h), int(w)) for h, w in sizes]
    assert sizes == sorted(sizes, reverse=True), (
        "pack_levels expects levels sorted large→small (pyramid order)"
    )
    h0, w0 = sizes[0]
    canvas_h = h0
    offsets: list[tuple[int, int]] = [(0, 0)]
    # Shelf cursor for the region right of the first level.
    cx = w0 + gap  # current shelf column
    cy = 0  # next free row within the shelf
    shelf_w = 0  # widest level placed in the current shelf
    for h, w in sizes[1:]:
        assert h <= canvas_h, "level taller than canvas"
        if cy + h > canvas_h:  # start a new shelf
            cx += shelf_w + gap
            cy, shelf_w = 0, 0
        offsets.append((cy, cx))
        cy += h + gap
        shelf_w = max(shelf_w, w)
    canvas_w = cx + shelf_w
    return CanvasLayout(canvas_h, canvas_w, tuple(offsets), tuple(sizes))


def canvas_constants(layout: CanvasLayout) -> dict[str, np.ndarray]:
    """Compile-time canvas constants for the fusion head.

    Returns float32 arrays:
      * ``grid``      (H, W, 2) — each level's normalized (y, x) center
        grid (``ops.anchors.create_grid``) placed at its offset, zeros in
        gaps;
      * ``occupancy`` (H, W, 1) — 1 on level cells, 0 elsewhere;
      * ``is_top``/``is_bot``/``is_left``/``is_right`` (H, W) — 1 where a
        cell lies on the corresponding border OF ITS LEVEL.
    """
    H, W = layout.height, layout.width
    grid = np.zeros((H, W, 2), np.float32)
    occ = np.zeros((H, W, 1), np.float32)
    masks = {k: np.zeros((H, W), np.float32) for k in ("is_top", "is_bot", "is_left", "is_right")}
    for (r, c), (h, w) in zip(layout.offsets, layout.sizes):
        grid[r : r + h, c : c + w] = anchor_ops.create_grid((h, w), flatten=False)
        occ[r : r + h, c : c + w] = 1.0
        masks["is_top"][r, c : c + w] = 1.0
        masks["is_bot"][r + h - 1, c : c + w] = 1.0
        masks["is_left"][r : r + h, c] = 1.0
        masks["is_right"][r : r + h, c + w - 1] = 1.0
    return {"grid": grid, "occupancy": occ, **masks}

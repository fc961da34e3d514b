"""Anchor pyramid machinery — static-shape, precomputed, TPU-friendly.

Capability parity with the reference's ``code/anchors.py`` (``create_grid``,
``create_anchors``, ``simple_match_anchors``; SURVEY.md §2 item 4 and §3.4),
redesigned for XLA:

  * the anchor pyramid is a **compile-time constant**: feature-map sizes are
    derived deterministically from the (fixed) input image size, so the full
    (A, 4) anchor tensor is built once in NumPy-land and closed over by the
    jitted train step — zero per-step cost;
  * matching produces dense per-anchor labels (+1 pos / 0 neg / -1 ignore)
    instead of the reference's boolean indexing, keeping every shape static
    inside jit (SURVEY.md §7 "hard parts" #1);
  * a best-anchor guarantee ensures ≥1 positive per ground-truth box even
    when no anchor clears the IoU threshold (single-query grounding would
    otherwise produce empty regression batches).

Coordinates are normalized to [-1, 1]; anchors are stored as cthw
(cy, cx, h, w). With input 300² and P3–P7 the pyramid has
38²+19²+10²+5²+3² = 1939 cells × 9 anchors = 17451 anchors.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.ops import boxes as box_ops

Array = jnp.ndarray

# FPN strides for P3..P7 (retina mode).
RETINA_STRIDES = (8, 16, 32, 64, 128)


def feature_map_sizes(
    img_size: Sequence[int], strides: Sequence[int] = RETINA_STRIDES
) -> tuple[tuple[int, int], ...]:
    """Deterministic (H_i, W_i) per pyramid level for a fixed input size.

    Uses ceil-division, matching SAME-padded stride-2 convs — e.g. 300² →
    (38,38),(19,19),(10,10),(5,5),(3,3) for P3..P7, the same sizes the
    reference reports per SURVEY.md §3.3.
    """
    h, w = int(img_size[0]), int(img_size[1])
    return tuple((math.ceil(h / s), math.ceil(w / s)) for s in strides)


def create_grid(size: Sequence[int], flatten: bool = True) -> np.ndarray:
    """Per-cell normalized (y, x) center grid for one feature map.

    size: (H, W). Returns (H*W, 2) if flatten else (H, W, 2), float32,
    centers in [-1, 1] (cell centers, i.e. offset by half a cell).
    Mirrors the reference's ``create_grid`` used both for the coordinate
    channels in the fusion step and for anchor placement.
    """
    h, w = int(size[0]), int(size[1])
    ys = (np.arange(h, dtype=np.float32) + 0.5) * (2.0 / h) - 1.0
    xs = (np.arange(w, dtype=np.float32) + 0.5) * (2.0 / w) - 1.0
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1)  # (H, W, 2)
    return grid.reshape(-1, 2) if flatten else grid


def create_anchors(
    scales: Sequence[float],
    ratios: Sequence[float],
    feat_sizes: Sequence[tuple[int, int]],
) -> np.ndarray:
    """Build the full anchor pyramid as a host-side constant.

    scales: e.g. (1, 2^(1/3), 2^(2/3)); ratios (h/w): e.g. (0.5, 1, 2);
    feat_sizes: per-level (H, W) from :func:`feature_map_sizes`.

    Per level, the anchor base extent is one cell (2/H × 2/W in normalized
    coords); each of the len(scales)*len(ratios) anchors per cell is
    (base_h·s·√r, base_w·s/√r). Returns (ΣHW·A, 4) float32 cthw.

    NumPy on purpose: this runs once at model-build time and the result is
    embedded in the jitted program as a constant (no per-step anchor
    generation, unlike the reference's cached-per-shape approach).
    """
    per_level = []
    for (h, w) in feat_sizes:
        grid = create_grid((h, w), flatten=False)  # (H, W, 2) centers
        base_h, base_w = 2.0 / h, 2.0 / w
        sizes = []
        for s in scales:
            for r in ratios:
                sizes.append((base_h * s * math.sqrt(r), base_w * s / math.sqrt(r)))
        sizes_arr = np.asarray(sizes, dtype=np.float32)  # (A, 2)
        a = sizes_arr.shape[0]
        centers = np.broadcast_to(grid[:, :, None, :], (h, w, a, 2))
        extents = np.broadcast_to(sizes_arr[None, None, :, :], (h, w, a, 2))
        anchors = np.concatenate([centers, extents], axis=-1)  # (H, W, A, 4)
        per_level.append(anchors.reshape(-1, 4))
    return np.concatenate(per_level, axis=0).astype(np.float32)


def num_anchors_per_cell(scales: Sequence[float], ratios: Sequence[float]) -> int:
    return len(scales) * len(ratios)


def simple_match_anchors(
    anchors_cthw: Array,
    gt_tlbr: Array,
    match_thr: float = 0.5,
    neg_thr: float = 0.4,
    force_best: bool = True,
) -> Array:
    """Dense anchor↔gt matching with static shapes.

    anchors_cthw: (A, 4); gt_tlbr: (..., 4) — one gt box per example
    (single-query grounding; leading dims broadcast, typically (B, 4)).

    Returns (..., A) int32 labels: +1 positive (IoU ≥ match_thr), 0 negative
    (IoU < neg_thr), -1 ignore (in the band). With ``force_best`` the
    highest-IoU anchor for each gt is promoted to positive regardless of
    threshold (RetinaNet-style band + fastai-style best-anchor guarantee,
    mirroring the reference's ``simple_match_anchors``; SURVEY.md §3.4).

    Entirely dense: argmax + one-hot + where — jit/vmap/Pallas friendly.
    """
    anchors_tlbr = box_ops.cthw2tlbr(anchors_cthw)  # (A, 4)
    iou = box_ops.iou_pairwise(gt_tlbr[..., None, :], anchors_tlbr)[..., 0, :]
    # iou: (..., A)
    labels = jnp.where(
        iou >= match_thr,
        jnp.int32(1),
        jnp.where(iou < neg_thr, jnp.int32(0), jnp.int32(-1)),
    )
    if force_best:
        best = jnp.argmax(iou, axis=-1)  # (...,)
        best_mask = jnp.arange(iou.shape[-1], dtype=jnp.int32) == best[..., None]
        labels = jnp.where(best_mask, jnp.int32(1), labels)
    return labels


def match_and_encode(
    anchors_cthw: Array,
    gt_tlbr: Array,
    match_thr: float = 0.5,
    neg_thr: float = 0.4,
    use_multi: bool = True,
) -> tuple[Array, Array]:
    """Fused matching + regression-target encoding for the train step.

    anchors_cthw: (A, 4); gt_tlbr: (B, 4) → labels (B, A) int32,
    reg_targets (B, A, 4) float32 (valid where label==1, defined everywhere
    so downstream masking needs no gather).

    ``use_multi=False`` reproduces the reference's best-anchor-only
    supervision variant (SURVEY.md §2 item 5 ``use_multi``): only the
    argmax-IoU anchor is positive; anchors above the match threshold are
    ignored rather than supervised.
    """
    labels = simple_match_anchors(anchors_cthw, gt_tlbr, match_thr, neg_thr)
    if not use_multi:
        anchors_tlbr = box_ops.cthw2tlbr(anchors_cthw)
        iou = box_ops.iou_pairwise(gt_tlbr[..., None, :], anchors_tlbr)[..., 0, :]
        best = jnp.argmax(iou, axis=-1)
        best_mask = jnp.arange(iou.shape[-1], dtype=jnp.int32) == best[..., None]
        # demote non-best positives to ignore, keep negatives negative
        labels = jnp.where(
            best_mask, jnp.int32(1), jnp.where(labels == 1, jnp.int32(-1), labels)
        )
    reg_targets = box_ops.bbox_to_reg_params(
        anchors_cthw[None, :, :], gt_tlbr[:, None, :]
    )
    return labels, reg_targets

"""Box geometry in normalized coordinates — pure jax.numpy, fully jittable.

Capability parity with the reference's ``code/anchors.py`` box utilities
(tlbr/cthw conversion, pairwise IoU, RetinaNet-style regression-parameter
encode/decode; see SURVEY.md §2 item 4), redesigned for TPU:

  * every function is shape-polymorphic over leading batch dims but uses
    only static-rank ops (no boolean indexing, no data-dependent shapes);
  * IoU is a dense pairwise computation that XLA fuses into a handful of
    VPU ops — no host loops;
  * all math stays in float32 regardless of the surrounding compute dtype
    (box/IoU numerics are precision-sensitive at bf16).

Conventions
-----------
``tlbr``: (y_min, x_min, y_max, x_max) — "top-left bottom-right".
``cthw``: (cy, cx, h, w) — center + extent.
Coordinates are normalized to [-1, 1] in both axes (matching the reference's
normalized-grid convention so converted checkpoints regress identically).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

# Reference decode scaling: regression deltas are divided by these factors
# before applying, i.e. pred_center = anchor_center + 0.1 * dy * anchor_h.
# Mirrors the (0.1, 0.2) variance convention used by SSD/RetinaNet lineage.
STD_CENTER = 0.1
STD_SIZE = 0.2


def tlbr2cthw(boxes: Array) -> Array:
    """(..., 4) tlbr → (..., 4) cthw."""
    boxes = boxes.astype(jnp.float32)
    center = (boxes[..., :2] + boxes[..., 2:]) * 0.5
    size = boxes[..., 2:] - boxes[..., :2]
    return jnp.concatenate([center, size], axis=-1)


def cthw2tlbr(boxes: Array) -> Array:
    """(..., 4) cthw → (..., 4) tlbr."""
    boxes = boxes.astype(jnp.float32)
    half = boxes[..., 2:] * 0.5
    return jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half], axis=-1)


def box_area_tlbr(boxes: Array) -> Array:
    """(..., 4) tlbr → (...,) area, clamped at 0 for degenerate boxes."""
    boxes = boxes.astype(jnp.float32)
    hw = jnp.maximum(boxes[..., 2:] - boxes[..., :2], 0.0)
    return hw[..., 0] * hw[..., 1]


def iou_pairwise(boxes1: Array, boxes2: Array) -> Array:
    """Dense pairwise IoU.

    boxes1: (..., N, 4) tlbr;  boxes2: (..., M, 4) tlbr → (..., N, M) IoU.

    One fused XLA region: broadcasted max/min + elementwise arithmetic on
    the VPU. N is the anchor count (~17k for the 300² P3–P7 pyramid), M is
    usually 1 (single gt box per query) so the train-time instance is a
    cheap (N, 1) computation.
    """
    b1 = boxes1.astype(jnp.float32)[..., :, None, :]  # (..., N, 1, 4)
    b2 = boxes2.astype(jnp.float32)[..., None, :, :]  # (..., 1, M, 4)
    tl = jnp.maximum(b1[..., :2], b2[..., :2])
    br = jnp.minimum(b1[..., 2:], b2[..., 2:])
    inter_hw = jnp.maximum(br - tl, 0.0)
    inter = inter_hw[..., 0] * inter_hw[..., 1]
    area1 = box_area_tlbr(boxes1)[..., :, None]
    area2 = box_area_tlbr(boxes2)[..., None, :]
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_aligned(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise IoU of aligned box arrays: (..., 4) × (..., 4) → (...,)."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    tl = jnp.maximum(b1[..., :2], b2[..., :2])
    br = jnp.minimum(b1[..., 2:], b2[..., 2:])
    inter_hw = jnp.maximum(br - tl, 0.0)
    inter = inter_hw[..., 0] * inter_hw[..., 1]
    union = box_area_tlbr(b1) + box_area_tlbr(b2) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def bbox_to_reg_params(anchors_cthw: Array, boxes_tlbr: Array) -> Array:
    """Encode target boxes as regression deltas relative to anchors.

    anchors_cthw: (..., 4) cthw; boxes_tlbr: (..., 4) tlbr (broadcastable).
    Returns (..., 4): (dcy, dcx, log dh, log dw) scaled by the SSD/RetinaNet
    variance convention (centers /0.1·size, sizes log/0.2). Inverse of
    :func:`reg_params_to_bbox`. Mirrors the reference's
    ``bbox_to_reg_params`` (SURVEY.md §2 item 4).
    """
    a = anchors_cthw.astype(jnp.float32)
    t = tlbr2cthw(boxes_tlbr)
    a_size = jnp.maximum(a[..., 2:], 1e-8)
    d_center = (t[..., :2] - a[..., :2]) / (a_size * STD_CENTER)
    d_size = jnp.log(jnp.maximum(t[..., 2:] / a_size, 1e-8)) / STD_SIZE
    return jnp.concatenate([d_center, d_size], axis=-1)


def reg_params_to_bbox(anchors_cthw: Array, reg: Array) -> Array:
    """Decode regression deltas back into tlbr boxes. Inverse of encode.

    anchors_cthw: (..., 4) cthw; reg: (..., 4) deltas → (..., 4) tlbr.
    Size deltas are clamped before exp to keep bf16-trained logits from
    producing inf boxes early in training.
    """
    a = anchors_cthw.astype(jnp.float32)
    reg = reg.astype(jnp.float32)
    center = a[..., :2] + reg[..., :2] * STD_CENTER * a[..., 2:]
    d_size = jnp.clip(reg[..., 2:] * STD_SIZE, -8.0, 8.0)
    size = a[..., 2:] * jnp.exp(d_size)
    return cthw2tlbr(jnp.concatenate([center, size], axis=-1))


def clip_boxes(boxes_tlbr: Array, low: float = -1.0, high: float = 1.0) -> Array:
    """Clamp tlbr boxes to the normalized image frame."""
    return jnp.clip(boxes_tlbr, low, high)


def scale_boxes_to_pixels(boxes_tlbr_norm: Array, img_hw: Array) -> Array:
    """Map normalized [-1,1] tlbr boxes to pixel coords for a (H, W) image.

    img_hw: (..., 2) float (H, W). Returns (..., 4) pixel tlbr (y1 x1 y2 x2).
    """
    hw = img_hw.astype(jnp.float32)
    scale = jnp.concatenate([hw, hw], axis=-1) * 0.5  # per-axis half-extent
    return (boxes_tlbr_norm + 1.0) * scale

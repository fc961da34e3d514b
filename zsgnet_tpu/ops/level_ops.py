"""Per-level NHWC loss & decode — the TPU-native hot path.

The reference (and our compat API) flattens all pyramid levels into
(B, ΣHWA[, 5]) tensors before matching/loss/decode (SURVEY.md §3.3-§3.5).
On TPU that flattening is a layout catastrophe: the conv outputs live as
NHWC tiles (channels on the 128-lane axis), and reshaping (B, H, W, A)
into unaligned flat segments costs ~17 ms/step in lane-shuffle relayouts
(measured, v5e, B=64) — 40× the forward pass itself.

This module computes the *same* quantities directly on the per-level
conv outputs in their native layout: anchors become per-level (H, W, A)
component constants, matching/focal/smooth-L1 are fused elementwise
chains over (B, H, W, A), and only (B,)-sized reductions cross levels.
Zero relayouts; XLA fuses each level's chain into a few passes.

Loss semantics match ``ops.losses.zsg_loss`` + ``match_and_encode``
exactly, including the argmax tie-break of the force-best promotion
(equality-tested in tests/test_level_ops.py). Decode ties (identical
scores at multiple anchors) average the candidates where the flat path
picks the first — measure-zero for real score tensors.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.ops import anchors as anchor_ops
from zsgnet_tpu.ops import boxes as box_ops
from zsgnet_tpu.ops import losses as loss_ops

Array = jnp.ndarray


def level_anchor_components(
    scales: Sequence[float],
    ratios: Sequence[float],
    feat_sizes: Sequence[tuple[int, int]],
) -> list[dict[str, np.ndarray]]:
    """Per-level anchor constants as (H, W, A) component arrays.

    Keys: tl_y, tl_x, br_y, br_x (tlbr) and cy, cx, h, w (cthw). Baked
    into the jitted program; ordering matches ``create_anchors``.
    """
    out = []
    offset = 0
    for (h, w) in feat_sizes:
        flat = anchor_ops.create_anchors(scales, ratios, [(h, w)])  # (HWA, 4)
        a = len(scales) * len(ratios)
        cthw = flat.reshape(h, w, a, 4)
        tlbr = np.asarray(box_ops.cthw2tlbr(jnp.asarray(flat))).reshape(h, w, a, 4)
        n = h * w * a
        out.append(
            {
                "tl_y": tlbr[..., 0], "tl_x": tlbr[..., 1],
                "br_y": tlbr[..., 2], "br_x": tlbr[..., 3],
                "cy": cthw[..., 0], "cx": cthw[..., 1],
                "h": cthw[..., 2], "w": cthw[..., 3],
                # Global flat anchor index ((reference ordering)) — used to
                # reproduce the flat path's argmax tie-break exactly.
                # f32-encoded; exact below 2^24 (A_total ≈ 17k-70k).
                "flat_idx": (offset + np.arange(n, dtype=np.float32)).reshape(h, w, a),
            }
        )
        offset += n
    return out


def _iou_level(comp: dict[str, Array], gt: Array) -> Array:
    """IoU of every anchor in one level vs gt. gt: (B, 4) → (B, H, W, A)."""
    g = gt.astype(jnp.float32)[:, None, None, None, :]
    ty = jnp.maximum(g[..., 0], comp["tl_y"])
    tx = jnp.maximum(g[..., 1], comp["tl_x"])
    by = jnp.minimum(g[..., 2], comp["br_y"])
    bx = jnp.minimum(g[..., 3], comp["br_x"])
    inter = jnp.maximum(by - ty, 0.0) * jnp.maximum(bx - tx, 0.0)
    area_g = jnp.maximum(g[..., 2] - g[..., 0], 0.0) * jnp.maximum(
        g[..., 3] - g[..., 1], 0.0
    )
    area_a = (comp["br_y"] - comp["tl_y"]) * (comp["br_x"] - comp["tl_x"])
    union = area_g + area_a - inter
    return jnp.where(union > 0, inter / union, 0.0)


def zsg_loss_levels(
    att_levels: Sequence[Array],
    delta_levels: Sequence[Sequence[Array]],
    anchor_comps: Sequence[dict[str, Array]],
    gt_tlbr: Array,
    *,
    lamb_reg: float = 1.0,
    match_thr: float = 0.5,
    neg_thr: float = 0.4,
    alpha: float = 0.25,
    gamma: float = 2.0,
    axis_name: str | None = None,
    sample_weight: Array | None = None,
) -> dict[str, Array]:
    """Focal + smooth-L1 grounding loss over per-level NHWC outputs.

    Same return dict and global-psum normalization as
    ``ops.losses.zsg_loss`` (focal/multi-positive path), including the
    optional ``sample_weight`` (B,) masking — a 0 removes the sample from
    every term and from the positive-count normalizer.
    """
    gt = gt_tlbr.astype(jnp.float32)
    w4 = (
        sample_weight.astype(jnp.float32)[:, None, None, None]
        if sample_weight is not None
        else None
    )
    ious = [_iou_level(c, gt) for c in anchor_comps]
    # Cross-level force-best with the flat path's exact argmax tie-break:
    # global max IoU, then the smallest flat anchor index achieving it.
    lvl_max = jnp.stack([jnp.max(iou, axis=(1, 2, 3)) for iou in ious], axis=-1)
    gbest = jnp.max(lvl_max, axis=-1)  # (B,)
    big = jnp.float32(1e9)
    lvl_min_idx = jnp.stack(
        [
            jnp.min(
                jnp.where(
                    iou == gbest[:, None, None, None], c["flat_idx"][None], big
                ),
                axis=(1, 2, 3),
            )
            for iou, c in zip(ious, anchor_comps)
        ],
        axis=-1,
    )  # (B, L); levels not containing the max contribute `big`
    g_idx = jnp.min(lvl_min_idx, axis=-1)[:, None, None, None]  # (B,1,1,1)

    cls_sum = jnp.zeros((), jnp.float32)
    box_sum = jnp.zeros((), jnp.float32)
    num_pos_local = jnp.zeros((), jnp.float32)
    g_cy = (gt[:, 0] + gt[:, 2]) * 0.5
    g_cx = (gt[:, 1] + gt[:, 3]) * 0.5
    g_h = gt[:, 2] - gt[:, 0]
    g_w = gt[:, 3] - gt[:, 1]

    for iou, att, deltas, comp in zip(ious, att_levels, delta_levels, anchor_comps):
        pos = (iou >= match_thr) | (comp["flat_idx"][None] == g_idx)
        posf = pos.astype(jnp.float32)
        valid = jnp.where((iou >= neg_thr) & ~pos, 0.0, 1.0)
        focal = loss_ops.sigmoid_focal_loss(att, posf, alpha, gamma)
        if w4 is not None:
            posf = posf * w4
            valid = valid * w4
        cls_sum = cls_sum + jnp.sum(focal * valid)
        num_pos_local = num_pos_local + jnp.sum(posf)

        a_h = jnp.maximum(comp["h"], 1e-8)
        a_w = jnp.maximum(comp["w"], 1e-8)
        bc = lambda v: v[:, None, None, None]  # noqa: E731
        targets = (
            (bc(g_cy) - comp["cy"]) / (a_h * box_ops.STD_CENTER),
            (bc(g_cx) - comp["cx"]) / (a_w * box_ops.STD_CENTER),
            jnp.log(jnp.maximum(bc(g_h) / a_h, 1e-8)) / box_ops.STD_SIZE,
            jnp.log(jnp.maximum(bc(g_w) / a_w, 1e-8)) / box_ops.STD_SIZE,
        )
        for d, t in zip(deltas, targets):
            box_sum = box_sum + jnp.sum(
                loss_ops.smooth_l1(d.astype(jnp.float32), t) * posf
            )

    if axis_name is not None:
        num_pos = jnp.maximum(jax.lax.psum(num_pos_local, axis_name), 1.0)
    else:
        num_pos = jnp.maximum(num_pos_local, 1.0)
    cls_ls = cls_sum / num_pos
    box_ls = box_sum / num_pos
    return {
        "total": cls_ls + lamb_reg * box_ls,
        "cls_ls": cls_ls,
        "box_ls": box_ls,
        "num_pos": num_pos_local,
    }


def _select_level(scores: Array, deltas: Sequence[Array], comp: dict[str, Array]):
    """Per-level argmax select via max-mask reductions, native layout.

    scores: (B, H, W, A) → (best (B,), sel_deltas 4×(B,), sel_anchor
    cthw 4×(B,)). Ties average (measure-zero for real scores).
    """
    best = jnp.max(scores, axis=(1, 2, 3))  # (B,)
    mask = (scores == best[:, None, None, None]).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0)

    def pick(v: Array) -> Array:
        return jnp.sum(mask * v, axis=(1, 2, 3)) / denom

    sel_d = tuple(pick(d.astype(jnp.float32)) for d in deltas)
    sel_anchor = tuple(pick(jnp.broadcast_to(comp[k], mask.shape)) for k in ("cy", "cx", "h", "w"))
    return best, sel_d, sel_anchor


def decode_best_box_levels(
    att_levels: Sequence[Array],
    delta_levels: Sequence[Sequence[Array]],
    anchor_comps: Sequence[dict[str, Array]],
    scores_levels: Sequence[Array] | None = None,
) -> tuple[Array, Array]:
    """Argmax-decode across the pyramid without flattening.

    Selection scores default to ``att_levels`` (standard decode); pass
    ``scores_levels`` (e.g. per-anchor IoU) for the MaxPos oracle decode.
    Returns (pred_box (B, 4) tlbr clipped, best_score (B,)).
    """
    scores_levels = scores_levels if scores_levels is not None else att_levels
    per_level = [
        _select_level(s, d, c)
        for s, d, c in zip(scores_levels, delta_levels, anchor_comps)
    ]
    lvl_best = jnp.stack([p[0] for p in per_level], axis=-1)  # (B, L)
    gbest = jnp.max(lvl_best, axis=-1)
    lmask = (lvl_best == gbest[:, None]).astype(jnp.float32)  # (B, L)
    lmask = lmask / jnp.maximum(jnp.sum(lmask, axis=-1, keepdims=True), 1.0)

    def combine(idx_fn) -> Array:
        stacked = jnp.stack([idx_fn(p) for p in per_level], axis=-1)  # (B, L)
        return jnp.sum(stacked * lmask, axis=-1)

    reg = jnp.stack([combine(lambda p, k=k: p[1][k]) for k in range(4)], axis=-1)
    anchor = jnp.stack([combine(lambda p, k=k: p[2][k]) for k in range(4)], axis=-1)
    pred = box_ops.clip_boxes(box_ops.reg_params_to_bbox(anchor, reg))
    return pred, gbest


def eval_batch_levels(
    out: dict,
    anchor_comps: Sequence[dict[str, Array]],
    gt_tlbr: Array,
    iou_thr: float = 0.5,
) -> dict[str, Array]:
    """Per-level equivalent of ``train.evaluator.eval_batch``."""
    att_levels = out["att_levels"]
    delta_levels = out["delta_levels"]
    pred_box, _ = decode_best_box_levels(att_levels, delta_levels, anchor_comps)
    iou = box_ops.iou_aligned(pred_box, gt_tlbr)
    correct = (iou > iou_thr).astype(jnp.float32)

    anchor_ious = [_iou_level(c, gt_tlbr) for c in anchor_comps]
    o_box, _ = decode_best_box_levels(
        att_levels, delta_levels, anchor_comps, scores_levels=anchor_ious
    )
    o_iou = box_ops.iou_aligned(o_box, gt_tlbr)
    max_pos = (o_iou > iou_thr).astype(jnp.float32)
    return {"iou": iou, "correct": correct, "pred_box": pred_box, "max_pos": max_pos}

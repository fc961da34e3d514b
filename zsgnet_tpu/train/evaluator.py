"""Grounding evaluator — acc@IoU, MaxPos diagnostic, zero-shot breakdown.

Capability parity with the reference's ``code/evaluator.py`` (SURVEY.md §2
item 6, §3.5): argmax over anchor scores → decode that anchor's box →
IoU vs gt → accuracy @ threshold; plus the ``MaxPos`` upper-bound
diagnostic (did the highest-scored anchor coincide with the best-IoU
anchor's hit?) and per-sample records enabling the paper's zero-shot
case (0–3) accuracy breakdown and prediction dumps.

TPU design: the per-batch computation (:func:`eval_batch`) is pure and
jit-compiled into the eval step — argmax + one gather + IoU, no host
sync. Accumulation across batches happens on host in ``Evaluator`` with
plain Python (runs once per epoch; not hot).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.ops import boxes as box_ops

Array = jnp.ndarray


def eval_batch(
    att_logits: Array,
    bbx_reg: Array,
    anchors_cthw: Array,
    gt_tlbr: Array,
    iou_thr: float = 0.5,
) -> dict[str, Array]:
    """Jittable per-batch grounding metrics.

    att_logits: (B, A); bbx_reg: (B, A, 4); anchors_cthw: (A, 4);
    gt_tlbr: (B, 4). Returns per-sample arrays: ``iou`` (B,), ``correct``
    (B,) float {0,1}, ``pred_box`` (B, 4) tlbr, ``max_pos`` (B,) float —
    whether the *best possible* anchor (highest IoU with gt) would itself
    decode to a hit (the reference's upper-bound diagnostic).
    """
    pred_box = decode_best_box(att_logits, bbx_reg, anchors_cthw)
    iou = box_ops.iou_aligned(pred_box, gt_tlbr)  # (B,)
    correct = (iou > iou_thr).astype(jnp.float32)

    # MaxPos: decode at the oracle-best anchor instead of the argmax-scored one.
    anchors_tlbr = box_ops.cthw2tlbr(anchors_cthw)
    anchor_iou = box_ops.iou_pairwise(gt_tlbr[:, None, :], anchors_tlbr)[:, 0, :]  # (B, A)
    o_box = decode_best_box(anchor_iou, bbx_reg, anchors_cthw)
    o_iou = box_ops.iou_aligned(o_box, gt_tlbr)
    max_pos = (o_iou > iou_thr).astype(jnp.float32)

    return {"iou": iou, "correct": correct, "pred_box": pred_box, "max_pos": max_pos}


def decode_best_box(scores: Array, bbx_reg: Array, anchors_cthw: Array) -> Array:
    """Argmax-select + decode via one-hot contractions — NOT gathers.

    scores: (B, A); bbx_reg: (B, A, 4); anchors: (A, 4) → (B, 4) tlbr.
    Dynamic gathers (``anchors[best]`` / ``take_along_axis``) cost ~18 ms
    for B=64, A=17k on TPU v5e; the equivalent one-hot einsum rides the
    MXU/VPU at <1 ms (measured in tools/profile_bench.py).
    """
    best = jnp.argmax(scores, axis=-1)  # (B,)
    onehot = (
        jnp.arange(scores.shape[-1], dtype=jnp.int32)[None, :] == best[:, None]
    ).astype(jnp.float32)  # (B, A)
    sel_anchor = onehot @ anchors_cthw.astype(jnp.float32)  # (B, 4)
    sel_reg = jnp.einsum("ba,bak->bk", onehot, bbx_reg.astype(jnp.float32))
    return box_ops.clip_boxes(box_ops.reg_params_to_bbox(sel_anchor, sel_reg))


class Evaluator:
    """Host-side accumulator with zero-shot case breakdown + dumps.

    Feed it the (host-transferred) outputs of :func:`eval_batch` along with
    optional per-sample zero-shot ``cases`` (int, -1 = n/a) and sample ids;
    ``summarize()`` returns the metric dict the Learner logs, keyed like
    the reference ('Acc', 'MaxPos', 'Acc_case_<k>').
    """

    def __init__(self, iou_thr: float = 0.5):
        self.iou_thr = iou_thr
        self.reset()

    def reset(self) -> None:
        self.correct: list[np.ndarray] = []
        self.max_pos: list[np.ndarray] = []
        self.iou: list[np.ndarray] = []
        self.cases: list[np.ndarray] = []
        self.ids: list[np.ndarray] = []
        self.pred_boxes: list[np.ndarray] = []
        self.losses: list[tuple[float, int]] = []  # (batch loss, valid count)

    def update(
        self,
        batch_metrics: dict[str, Any],
        cases: np.ndarray | None = None,
        ids: np.ndarray | None = None,
        valid: np.ndarray | None = None,
    ) -> None:
        """valid: bool mask for padded tail batches (static-shape eval)."""
        correct = np.asarray(batch_metrics["correct"])
        n = correct.shape[0]
        if valid is None:
            valid = np.ones(n, dtype=bool)
        valid = np.asarray(valid, dtype=bool)
        self.correct.append(correct[valid])
        self.max_pos.append(np.asarray(batch_metrics["max_pos"])[valid])
        self.iou.append(np.asarray(batch_metrics["iou"])[valid])
        self.pred_boxes.append(np.asarray(batch_metrics["pred_box"])[valid])
        if cases is not None:
            self.cases.append(np.asarray(cases)[valid])
        if ids is not None:
            self.ids.append(np.asarray(ids)[valid])
        if "loss" in batch_metrics:  # per-batch scalar, broadcast per-sample
            # Recorded with the batch's VALID count so summarize() can
            # weight tail batches by their real size (VERDICT r2 weak #5:
            # equal-weight averaging over-weighted small tail batches).
            self.losses.append(
                (float(np.asarray(batch_metrics["loss"]).reshape(-1)[0]), int(valid.sum()))
            )

    def summarize(self) -> dict[str, float]:
        if not self.correct:
            return {}
        correct = np.concatenate(self.correct)
        out = {
            "Acc": float(correct.mean()) if correct.size else 0.0,
            "MaxPos": float(np.concatenate(self.max_pos).mean()),
            "MeanIoU": float(np.concatenate(self.iou).mean()),
            "num_samples": float(correct.size),
        }
        if self.losses:  # val loss — same variant the train step optimizes
            # Valid-count-weighted mean: a wrap-padded tail batch counts
            # per its real samples. (Residual approximation: the tail
            # batch's loss VALUE is still computed over the full static
            # batch incl. wrapped repeats — in-graph normalizers like
            # num_pos are global — so tail values mix in repeated
            # samples. Metrics mask exactly; the loss is logging-only.)
            vals = np.array([v for v, _ in self.losses])
            wts = np.array([n for _, n in self.losses], dtype=np.float64)
            out["loss"] = float((vals * wts).sum() / max(wts.sum(), 1.0))
        if self.cases:
            cases = np.concatenate(self.cases)
            for c in sorted(set(int(x) for x in cases if x >= 0)):
                m = cases == c
                out[f"Acc_case_{c}"] = float(correct[m].mean()) if m.any() else 0.0
        return out

    def dump_predictions(self, path: str) -> None:
        """Per-sample prediction dump for offline zero-shot analysis."""
        import json

        ids = np.concatenate(self.ids) if self.ids else None
        boxes_arr = np.concatenate(self.pred_boxes)
        iou = np.concatenate(self.iou)
        correct = np.concatenate(self.correct)
        with open(path, "w") as f:
            for i in range(len(iou)):
                rec = {
                    "id": int(ids[i]) if ids is not None else i,
                    "pred_box": [float(v) for v in boxes_arr[i]],
                    "iou": float(iou[i]),
                    "correct": bool(correct[i]),
                }
                f.write(json.dumps(rec) + "\n")

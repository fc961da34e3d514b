"""Grounding losses — masked, static-shape, single fused XLA region.

Capability parity with the reference's ``code/loss.py`` (``ZSGLoss``:
sigmoid focal loss on anchor scores + smooth-L1 on matched-anchor
regression; SURVEY.md §2 item 5 and §3.4), redesigned for TPU:

  * the reference indexes positives with boolean masks
    (``bbx_out[pos]``) — data-dependent shapes that would force retraces.
    Here every reduction is a masked dense sum, so the whole loss is one
    jit-compatible fused region;
  * loss math is forced to float32 even when activations arrive as
    bfloat16 (focal-loss numerics degrade badly at bf16 — SURVEY.md §7);
  * variants the reference gates by config are preserved: plain BCE
    (``use_focal=False``), softmax-over-anchors (``use_softmax``),
    multi-positive vs best-anchor supervision (``use_multi``).

The same math also exists as a fused Pallas kernel in
``zsgnet_tpu.ops.pallas.fused_loss``; this module is the reference
implementation it is tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def sigmoid_focal_loss(
    logits: Array,
    targets: Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Array:
    """Elementwise sigmoid focal loss (Lin et al. 2017), float32.

    logits/targets: broadcastable; targets in {0, 1}. Returns per-element
    loss (no reduction). Uses the logit-space stable BCE formulation
    (max(x,0) - x·t + log1p(exp(-|x|))) so bf16-activations → fp32 loss is
    exact.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p = jax.nn.sigmoid(x)
    p_t = p * t + (1.0 - p) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    return alpha_t * jnp.power(1.0 - p_t, gamma) * bce


def bce_loss(logits: Array, targets: Array) -> Array:
    """Plain stable sigmoid BCE, elementwise, float32 (``use_focal=False``)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def smooth_l1(pred: Array, target: Array, beta: float = 1.0 / 9.0) -> Array:
    """Elementwise smooth-L1 (Huber), float32.

    beta = 1/9 is the RetinaNet convention for variance-scaled regression
    targets. Returns per-element loss (no reduction).
    """
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def zsg_loss(
    att_logits: Array,
    bbx_reg: Array,
    labels: Array,
    reg_targets: Array,
    *,
    lamb_reg: float = 1.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    use_focal: bool = True,
    use_softmax: bool = False,
    axis_name: str | None = None,
    sample_weight: Array | None = None,
) -> dict[str, Array]:
    """Total grounding loss over one batch — fully masked, static shapes.

    att_logits: (B, A) anchor match scores (pre-sigmoid).
    bbx_reg:    (B, A, 4) predicted regression deltas.
    labels:     (B, A) int32 from ``anchors.simple_match_anchors``
                (+1 pos / 0 neg / -1 ignore).
    reg_targets:(B, A, 4) encode of gt vs every anchor (valid where pos).

    Classification: focal (or BCE) over non-ignored anchors, normalized by
    the positive count (RetinaNet convention); with ``use_softmax``, a
    softmax cross-entropy over the anchor axis against the positive
    distribution (the reference's ``use_softmax`` variant).
    Regression: smooth-L1 summed over positive anchors / #pos.

    Returns dict: total, cls_ls, box_ls, num_pos — matching the
    reference's sub-loss logging dict (SURVEY.md §2 item 5).

    ``axis_name``: when the loss runs inside ``shard_map`` over a data
    mesh, pass the mesh axis so normalization uses the GLOBAL positive
    count (psum). The per-shard values then sum (lax.psum) to exactly the
    loss/gradient of the equivalent single-device global batch — stronger
    than DDP's per-replica normalization, whose effective loss depends on
    how positives land across replicas.

    ``sample_weight``: optional (B,) per-sample weights in [0, 1] — a 0
    removes that sample from every term AND from the positive-count
    normalizer (grouped multi-query wrap-repeats / eval tail pads are
    masked this way, so each real pair weighs exactly once). ``None``
    (the default) is exactly the unweighted math.
    """
    labels = labels.astype(jnp.int32)
    pos = (labels == 1).astype(jnp.float32)  # (B, A)
    valid = (labels != -1).astype(jnp.float32)  # non-ignored
    if sample_weight is not None:
        w = sample_weight.astype(jnp.float32)[:, None]  # (B, 1)
        pos_w = pos * w
        valid = valid * w
        bs_local = jnp.sum(w[:, 0])
    else:
        pos_w = pos
        bs_local = jnp.float32(att_logits.shape[0])
    num_pos_local = jnp.sum(pos_w)
    if axis_name is not None:
        num_pos = jnp.maximum(jax.lax.psum(num_pos_local, axis_name), 1.0)
        global_bs = jax.lax.psum(bs_local, axis_name)
    else:
        num_pos = jnp.maximum(num_pos_local, 1.0)
        global_bs = bs_local

    if use_softmax:
        # Softmax over anchors: target distribution uniform over positives.
        logits32 = att_logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(
            jnp.where(valid > 0, logits32, -1e9), axis=-1, keepdims=True
        )
        logp = logits32 - logz
        tgt = pos / jnp.maximum(jnp.sum(pos, axis=-1, keepdims=True), 1.0)
        cls_ls = -jnp.sum(tgt * logp * valid) / global_bs
    else:
        elem = (
            sigmoid_focal_loss(att_logits, pos, alpha, gamma)
            if use_focal
            else bce_loss(att_logits, pos)
        )
        cls_ls = jnp.sum(elem * valid) / num_pos

    reg_elem = smooth_l1(bbx_reg, reg_targets)  # (B, A, 4)
    box_ls = jnp.sum(reg_elem * pos_w[..., None]) / num_pos

    total = cls_ls + lamb_reg * box_ls
    return {
        "total": total,
        "cls_ls": cls_ls,
        "box_ls": box_ls,
        "num_pos": num_pos_local,
    }

"""Per-level NHWC path vs flat reference path — exact equality.

The level path is the TPU hot path; the flat path is the
reference-contract oracle. Loss, decode, and full eval must agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.ops import anchors as anchor_ops, losses
from zsgnet_tpu.ops.level_ops import (
    decode_best_box_levels,
    eval_batch_levels,
    level_anchor_components,
    zsg_loss_levels,
)
from zsgnet_tpu.train.evaluator import eval_batch


SCALES = (1.0, 1.26)
RATIOS = (0.5, 1.0, 2.0)
SIZES = ((8, 8), (4, 4), (2, 2))
A_PER = len(SCALES) * len(RATIOS)


def _setup(rng, B=4):
    anchors = anchor_ops.create_anchors(SCALES, RATIOS, SIZES)
    comps = [
        {k: jnp.asarray(v) for k, v in c.items()}
        for c in level_anchor_components(SCALES, RATIOS, SIZES)
    ]
    A = anchors.shape[0]
    att = rng.normal(size=(B, A)).astype(np.float32) * 2
    bbx = rng.normal(size=(B, A, 4)).astype(np.float32)
    gt = rng.uniform(-1, 1, size=(B, 4)).astype(np.float32)
    gt = np.concatenate(
        [np.minimum(gt[:, :2], gt[:, 2:]), np.maximum(gt[:, :2], gt[:, 2:]) + 0.05],
        axis=1,
    )
    # Split flat arrays into per-level NHWC views (inverse of the model's
    # flatten: idx = (y*W + x)*A + a).
    att_levels, delta_levels = [], []
    off = 0
    for (h, w) in SIZES:
        n = h * w * A_PER
        att_levels.append(jnp.asarray(att[:, off : off + n].reshape(B, h, w, A_PER)))
        d = bbx[:, off : off + n].reshape(B, h, w, A_PER, 4)
        delta_levels.append(tuple(jnp.asarray(d[..., k]) for k in range(4)))
        off += n
    return anchors, comps, att, bbx, gt, att_levels, delta_levels


def test_loss_levels_matches_flat(rng):
    anchors, comps, att, bbx, gt, att_l, delta_l = _setup(rng)
    labels, reg_t = anchor_ops.match_and_encode(
        jnp.asarray(anchors), jnp.asarray(gt), 0.5, 0.4
    )
    want = losses.zsg_loss(jnp.asarray(att), jnp.asarray(bbx), labels, reg_t)
    got = zsg_loss_levels(att_l, delta_l, comps, jnp.asarray(gt))
    for k in ("total", "cls_ls", "box_ls", "num_pos"):
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=2e-5, err_msg=k)


def test_decode_levels_matches_flat(rng):
    from zsgnet_tpu.train.evaluator import decode_best_box

    anchors, comps, att, bbx, gt, att_l, delta_l = _setup(rng)
    want = np.asarray(
        decode_best_box(jnp.asarray(att), jnp.asarray(bbx), jnp.asarray(anchors))
    )
    got, best = decode_best_box_levels(att_l, delta_l, comps)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(best), att.max(axis=1), atol=1e-6)


def test_eval_levels_matches_flat(rng):
    anchors, comps, att, bbx, gt, att_l, delta_l = _setup(rng)
    want = eval_batch(
        jnp.asarray(att), jnp.asarray(bbx), jnp.asarray(anchors), jnp.asarray(gt)
    )
    out = {"att_levels": att_l, "delta_levels": delta_l}
    got = eval_batch_levels(out, comps, jnp.asarray(gt))
    for k in ("iou", "correct", "max_pos"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=1e-5, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(got["pred_box"]), np.asarray(want["pred_box"]), atol=1e-5
    )


def test_model_level_and_flat_outputs_consistent(rng):
    """The model's flat outputs must be the exact flatten of its levels."""
    import jax

    from zsgnet_tpu.config import Config
    from zsgnet_tpu.models.zsgnet import ZSGNet

    cfg = Config(
        resize_img=(64, 64), lstm_dim=8, emb_dim=8, max_qlen=6,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
    )
    model = ZSGNet(cfg=cfg, vocab_size=30)
    batch = {
        "img": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "qvec": jnp.asarray(rng.integers(1, 30, size=(2, 6)).astype(np.int32)),
        "qlens": jnp.asarray(np.array([2, 6], np.int32)),
    }
    vs = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(vs, batch)
    flat_att = np.concatenate(
        [np.asarray(a).reshape(2, -1) for a in out["att_levels"]], axis=1
    )
    np.testing.assert_allclose(np.asarray(out["att_out"]), flat_att, atol=1e-6)
    flat_bbx = np.concatenate(
        [
            np.stack([np.asarray(d).reshape(2, -1) for d in dl], axis=-1)
            for dl in out["delta_levels"]
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(out["bbx_out"]), flat_bbx, atol=1e-6)


def test_regroup_head_kernel():
    from zsgnet_tpu.convert.torch_import import regroup_head_kernel

    a = 3
    kernel = np.zeros((1, 1, 2, a * 5), np.float32)
    for ai in range(a):
        for k in range(5):
            kernel[..., ai * 5 + k] = ai * 10 + k
    bias = kernel[0, 0, 0].copy()
    k2, b2 = regroup_head_kernel(kernel, bias, a)
    # component-grouped: [score(a0,a1,a2), dy(a0..), dx, dh, dw]
    want = [0, 10, 20, 1, 11, 21, 2, 12, 22, 3, 13, 23, 4, 14, 24]
    np.testing.assert_array_equal(k2[0, 0, 0], want)
    np.testing.assert_array_equal(b2, want)


def test_loss_levels_sample_weight_subset_equality(rng):
    """Weighted per-level loss ≡ flat weighted loss ≡ subset loss."""
    anchors, comps, att, bbx, gt, att_l, delta_l = _setup(rng, B=4)
    keep = np.array([1, 0, 1, 1], np.float32)
    sub = keep.astype(bool)
    labels, reg_t = anchor_ops.match_and_encode(
        jnp.asarray(anchors), jnp.asarray(gt[sub]), 0.5, 0.4
    )
    want = losses.zsg_loss(
        jnp.asarray(att[sub]), jnp.asarray(bbx[sub]), labels, reg_t
    )
    got = zsg_loss_levels(
        att_l, delta_l, comps, jnp.asarray(gt),
        sample_weight=jnp.asarray(keep),
    )
    for k in ("total", "cls_ls", "box_ls", "num_pos"):
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=2e-5, err_msg=k)

"""Box-geometry unit tests vs hand-computed cases and a NumPy oracle.

The reference ships no tests (SURVEY.md §4); these pin the parity-risk
hotspot (SURVEY.md §7 layer 1): conversions, IoU, encode/decode roundtrip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.ops import boxes


def test_tlbr_cthw_roundtrip(rng):
    b = rng.uniform(-1, 1, size=(64, 4)).astype(np.float32)
    b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], axis=1)
    out = np.asarray(boxes.cthw2tlbr(boxes.tlbr2cthw(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_tlbr2cthw_hand_case():
    tlbr = jnp.array([[-1.0, -1.0, 1.0, 1.0], [0.0, 0.0, 0.5, 1.0]])
    cthw = np.asarray(boxes.tlbr2cthw(tlbr))
    np.testing.assert_allclose(cthw[0], [0.0, 0.0, 2.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(cthw[1], [0.25, 0.5, 0.5, 1.0], atol=1e-6)


def _iou_oracle(b1, b2):
    """O(N*M) loopy NumPy IoU oracle."""
    out = np.zeros((b1.shape[0], b2.shape[0]), dtype=np.float64)
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            ty, tx = max(a[0], b[0]), max(a[1], b[1])
            by, bx = min(a[2], b[2]), min(a[3], b[3])
            inter = max(by - ty, 0) * max(bx - tx, 0)
            area_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
            area_b = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
            union = area_a + area_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_iou_vs_oracle(rng):
    def rand_boxes(n):
        p = rng.uniform(-1, 1, size=(n, 4)).astype(np.float32)
        return np.concatenate(
            [np.minimum(p[:, :2], p[:, 2:]), np.maximum(p[:, :2], p[:, 2:])], axis=1
        )

    b1, b2 = rand_boxes(40), rand_boxes(7)
    got = np.asarray(boxes.iou_pairwise(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, _iou_oracle(b1, b2), atol=1e-5)


def test_iou_hand_cases():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array(
        [[0.0, 0.0, 1.0, 1.0], [0.0, 0.5, 1.0, 1.5], [2.0, 2.0, 3.0, 3.0]]
    )
    got = np.asarray(boxes.iou_pairwise(a, b))[0]
    np.testing.assert_allclose(got, [1.0, 1.0 / 3.0, 0.0], atol=1e-6)


def test_iou_degenerate_zero_area():
    a = jnp.array([[0.5, 0.5, 0.5, 0.5]])  # zero-area box
    b = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    assert float(boxes.iou_pairwise(a, b)[0, 0]) == 0.0


def test_encode_decode_roundtrip(rng):
    anchors = np.stack(
        [
            rng.uniform(-0.8, 0.8, 400),
            rng.uniform(-0.8, 0.8, 400),
            rng.uniform(0.05, 0.5, 400),
            rng.uniform(0.05, 0.5, 400),
        ],
        axis=1,
    ).astype(np.float32)
    gt = rng.uniform(-1, 1, size=(400, 4)).astype(np.float32)
    gt = np.concatenate(
        [np.minimum(gt[:, :2], gt[:, 2:]), np.maximum(gt[:, :2], gt[:, 2:]) + 0.02],
        axis=1,
    )
    reg = boxes.bbox_to_reg_params(jnp.asarray(anchors), jnp.asarray(gt))
    back = np.asarray(boxes.reg_params_to_bbox(jnp.asarray(anchors), reg))
    np.testing.assert_allclose(back, gt, atol=1e-4)


def test_encode_zero_for_perfect_anchor():
    anchor = jnp.array([[0.0, 0.0, 1.0, 1.0]])  # cthw
    gt_tlbr = jnp.array([[-0.5, -0.5, 0.5, 0.5]])  # same box as tlbr
    reg = np.asarray(boxes.bbox_to_reg_params(anchor, gt_tlbr))
    np.testing.assert_allclose(reg, np.zeros((1, 4)), atol=1e-6)


def test_decode_clamps_extreme_deltas():
    anchor = jnp.array([[0.0, 0.0, 0.5, 0.5]])
    reg = jnp.array([[0.0, 0.0, 1e4, 1e4]])
    out = np.asarray(boxes.reg_params_to_bbox(anchor, reg))
    assert np.all(np.isfinite(out))


def test_scale_boxes_to_pixels():
    norm = jnp.array([[-1.0, -1.0, 1.0, 1.0]])
    hw = jnp.array([[300.0, 400.0]])
    px = np.asarray(boxes.scale_boxes_to_pixels(norm, hw))
    np.testing.assert_allclose(px, [[0.0, 0.0, 300.0, 400.0]], atol=1e-5)

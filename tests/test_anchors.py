"""Anchor pyramid + matching tests (SURVEY.md §2 item 4, §3.4)."""

import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.ops import anchors, boxes


def test_feature_map_sizes_300():
    # 300² with P3–P7 strides → the sizes the reference reports (§3.3).
    sizes = anchors.feature_map_sizes((300, 300))
    assert sizes == ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3))


def test_grid_centers_unit():
    g = anchors.create_grid((2, 2), flatten=False)
    np.testing.assert_allclose(g[0, 0], [-0.5, -0.5], atol=1e-6)
    np.testing.assert_allclose(g[1, 1], [0.5, 0.5], atol=1e-6)
    assert anchors.create_grid((4, 6)).shape == (24, 2)


def test_anchor_count_300():
    sizes = anchors.feature_map_sizes((300, 300))
    a = anchors.create_anchors((1.0, 2 ** (1 / 3), 2 ** (2 / 3)), (0.5, 1.0, 2.0), sizes)
    # 38²+19²+10²+5²+3² = 1939 cells × 9 anchors = 17451
    # (SURVEY.md §3.3 says "≈1899 cells/17k anchors" — its arithmetic was off)
    assert a.shape == (17451, 4)
    # Anchors are cthw with positive extents, centers within the frame.
    assert np.all(a[:, 2:] > 0)
    assert np.all(np.abs(a[:, :2]) <= 1.0)


def test_anchor_aspect_ratios():
    a = anchors.create_anchors((1.0,), (0.5, 1.0, 2.0), [(4, 4)])
    a = a.reshape(4, 4, 3, 4)
    h, w = a[0, 0, :, 2], a[0, 0, :, 3]
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], atol=1e-5)
    # scale=1, ratio=1 anchor is exactly one cell: 2/4 × 2/4.
    np.testing.assert_allclose(a[0, 0, 1, 2:], [0.5, 0.5], atol=1e-6)


def test_matching_labels():
    # Anchors: one perfectly on the gt, one overlapping, one far away.
    anc = jnp.array(
        [
            [0.0, 0.0, 0.5, 0.5],    # IoU 1 with gt → pos
            [0.05, 0.05, 0.5, 0.5],  # high IoU → pos
            [0.22, 0.0, 0.5, 0.5],   # moderate IoU → band or neg
            [0.8, 0.8, 0.1, 0.1],    # no overlap → neg
        ]
    )
    gt = jnp.array([[-0.25, -0.25, 0.25, 0.25]])  # == anchor0 as tlbr
    labels = np.asarray(anchors.simple_match_anchors(anc, gt, 0.5, 0.4))
    assert labels.shape == (1, 4)
    assert labels[0, 0] == 1
    assert labels[0, 1] == 1
    assert labels[0, 3] == 0


def test_matching_force_best_guarantees_positive():
    # No anchor clears the threshold; best must still be promoted.
    anc = jnp.array([[0.8, 0.8, 0.1, 0.1], [0.6, 0.6, 0.1, 0.1]])
    gt = jnp.array([[-0.9, -0.9, -0.5, -0.5]])
    labels = np.asarray(anchors.simple_match_anchors(anc, gt))
    assert (labels == 1).sum() == 1


def test_match_and_encode_shapes_and_targets():
    sizes = anchors.feature_map_sizes((64, 64), strides=(8, 16))
    anc = jnp.asarray(anchors.create_anchors((1.0,), (1.0,), sizes))
    gt = jnp.array([[-0.3, -0.3, 0.3, 0.3], [0.1, 0.1, 0.6, 0.6]])
    labels, reg_t = anchors.match_and_encode(anc, gt)
    assert labels.shape == (2, anc.shape[0])
    assert reg_t.shape == (2, anc.shape[0], 4)
    # Decoding the target at any positive anchor must recover the gt box.
    lab = np.asarray(labels)
    pos_idx = np.argwhere(lab == 1)
    assert len(pos_idx) >= 2
    b, a_i = pos_idx[0]
    back = np.asarray(boxes.reg_params_to_bbox(anc[a_i], reg_t[b, a_i]))
    np.testing.assert_allclose(back, np.asarray(gt[b]), atol=1e-4)

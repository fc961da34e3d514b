"""Pallas kernel equality tests vs the pure-jnp reference implementations.

Run in interpreter mode on the CPU test platform (the kernels themselves
are exercised compiled on TPU by bench/drive scripts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from zsgnet_tpu.ops import anchors as anchor_ops, losses
from zsgnet_tpu.ops.pallas.fused_loss import pack_anchors, zsg_loss_fused


def _setup(rng, B=8):
    sizes = anchor_ops.feature_map_sizes((64, 64), strides=(8, 16, 32))
    anchors = anchor_ops.create_anchors((1.0, 1.26), (0.5, 1.0, 2.0), sizes)
    A = anchors.shape[0]
    att = rng.normal(size=(B, A)).astype(np.float32) * 2
    bbx = rng.normal(size=(B, A, 4)).astype(np.float32)
    gt = rng.uniform(-1, 1, size=(B, 4)).astype(np.float32)
    gt = np.concatenate(
        [np.minimum(gt[:, :2], gt[:, 2:]), np.maximum(gt[:, :2], gt[:, 2:]) + 0.05],
        axis=1,
    )
    return anchors, att, bbx, gt


def _reference_loss(anchors, att, bbx, gt):
    labels, reg_t = anchor_ops.match_and_encode(
        jnp.asarray(anchors), jnp.asarray(gt), 0.5, 0.4
    )
    return losses.zsg_loss(
        jnp.asarray(att), jnp.asarray(bbx), labels, reg_t, lamb_reg=1.0
    )


def test_fused_loss_matches_reference(rng):
    anchors, att, bbx, gt = _setup(rng)
    want = _reference_loss(anchors, att, bbx, gt)
    packed = jnp.asarray(pack_anchors(anchors))
    with pltpu.force_tpu_interpret_mode():
        got = zsg_loss_fused(
            jnp.asarray(att), jnp.asarray(bbx), packed, jnp.asarray(gt),
            num_anchors=anchors.shape[0],
        )
    for k in ("total", "cls_ls", "box_ls", "num_pos"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=2e-5, err_msg=k
        )


def test_fused_loss_gradients_match(rng):
    anchors, att, bbx, gt = _setup(rng)
    packed = jnp.asarray(pack_anchors(anchors))
    A = anchors.shape[0]

    def ref_total(att, bbx):
        return _reference_loss(anchors, att, bbx, gt)["total"]

    def fused_total(att, bbx):
        return zsg_loss_fused(att, bbx, packed, jnp.asarray(gt), num_anchors=A)["total"]

    g_ref = jax.grad(ref_total, argnums=(0, 1))(jnp.asarray(att), jnp.asarray(bbx))
    with pltpu.force_tpu_interpret_mode():
        g_fus = jax.grad(fused_total, argnums=(0, 1))(jnp.asarray(att), jnp.asarray(bbx))
    np.testing.assert_allclose(np.asarray(g_fus[0]), np.asarray(g_ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]), atol=1e-6)


def test_pack_anchors_layout():
    anchors = anchor_ops.create_anchors(
        (1.0,), (1.0,), anchor_ops.feature_map_sizes((64, 64), strides=(8,))
    )
    packed = pack_anchors(anchors)
    assert packed.shape[0] == 8 and packed.shape[1] % 512 == 0
    A = anchors.shape[0]
    np.testing.assert_allclose(packed[4:8, :A], anchors.T, atol=1e-6)
    # tlbr rows consistent with cthw rows
    np.testing.assert_allclose(
        packed[0, :A], anchors[:, 0] - anchors[:, 2] / 2, atol=1e-6
    )


def test_fused_loss_sample_weight_matches_reference(rng):
    """Weighted fused loss (aux col 5) ≡ jnp loss over the kept subset —
    values AND gradients (the weight scales both loss terms and the
    positive-count normalizer; grouped wrap-repeat masking rides this)."""
    anchors, att, bbx, gt = _setup(rng)
    packed = jnp.asarray(pack_anchors(anchors))
    A = anchors.shape[0]
    keep = np.array([1, 0, 1, 1, 1, 0, 1, 1], np.float32)
    sub = keep.astype(bool)

    want = _reference_loss(anchors, att[sub], bbx[sub], gt[sub])
    with pltpu.force_tpu_interpret_mode():
        got = zsg_loss_fused(
            jnp.asarray(att), jnp.asarray(bbx), packed, jnp.asarray(gt),
            num_anchors=A, sample_weight=jnp.asarray(keep),
        )
    for k in ("total", "cls_ls", "box_ls", "num_pos"):
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=2e-5, err_msg=k
        )

    def fused_total(att_, bbx_):
        return zsg_loss_fused(
            att_, bbx_, packed, jnp.asarray(gt), num_anchors=A,
            sample_weight=jnp.asarray(keep),
        )["total"]

    def ref_total(att_, bbx_):
        return _reference_loss(anchors, att_, bbx_, gt[sub])["total"]

    g_ref = jax.grad(ref_total, argnums=(0, 1))(
        jnp.asarray(att[sub]), jnp.asarray(bbx[sub])
    )
    with pltpu.force_tpu_interpret_mode():
        g_fus = jax.grad(fused_total, argnums=(0, 1))(
            jnp.asarray(att), jnp.asarray(bbx)
        )
    # Masked rows get exactly zero gradient; kept rows match the subset.
    np.testing.assert_allclose(np.asarray(g_fus[0])[sub], np.asarray(g_ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fus[1])[sub], np.asarray(g_ref[1]), atol=1e-6)
    assert np.all(np.asarray(g_fus[0])[~sub] == 0)
    assert np.all(np.asarray(g_fus[1])[~sub] == 0)

"""Loss tests vs torch-CPU oracle and hand math (SURVEY.md §4 strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.ops import losses


def test_focal_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(4, 100)).astype(np.float32)
    t = (rng.uniform(size=(4, 100)) > 0.8).astype(np.float32)
    got = np.asarray(losses.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t)))

    tx, tt = torch.tensor(x), torch.tensor(t)
    p = torch.sigmoid(tx)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(tx, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    want = (alpha_t * (1 - p_t) ** 2 * ce).numpy()
    # fp32 evaluation-order differences between XLA and torch/oneDNN
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_focal_extreme_logits_finite():
    x = jnp.array([[-1e4, 1e4, 0.0]])
    t = jnp.array([[1.0, 0.0, 1.0]])
    out = np.asarray(losses.sigmoid_focal_loss(x, t))
    assert np.all(np.isfinite(out))


def test_smooth_l1_matches_torch(rng):
    torch = pytest.importorskip("torch")
    a = rng.normal(size=(50, 4)).astype(np.float32)
    b = rng.normal(size=(50, 4)).astype(np.float32)
    got = np.asarray(losses.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    want = torch.nn.functional.smooth_l1_loss(
        torch.tensor(a), torch.tensor(b), reduction="none", beta=1.0 / 9.0
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def _setup_loss_batch(rng, B=2, A=64):
    att = rng.normal(size=(B, A)).astype(np.float32)
    reg = rng.normal(size=(B, A, 4)).astype(np.float32)
    labels = rng.choice([-1, 0, 1], size=(B, A), p=[0.1, 0.8, 0.1]).astype(np.int32)
    # ensure at least one positive
    labels[:, 0] = 1
    reg_t = rng.normal(size=(B, A, 4)).astype(np.float32)
    return att, reg, labels, reg_t


def test_zsg_loss_masking_semantics(rng):
    att, reg, labels, reg_t = _setup_loss_batch(rng)
    out = losses.zsg_loss(
        jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t)
    )
    # Oracle: loopy NumPy with explicit pos/ignore handling.
    pos = labels == 1
    valid = labels != -1
    num_pos = max(pos.sum(), 1)
    focal = np.asarray(losses.sigmoid_focal_loss(jnp.asarray(att), jnp.asarray(pos.astype(np.float32))))
    cls_want = (focal * valid).sum() / num_pos
    sl1 = np.asarray(losses.smooth_l1(jnp.asarray(reg), jnp.asarray(reg_t)))
    box_want = (sl1 * pos[..., None]).sum() / num_pos
    np.testing.assert_allclose(float(out["cls_ls"]), cls_want, rtol=1e-5)
    np.testing.assert_allclose(float(out["box_ls"]), box_want, rtol=1e-5)
    np.testing.assert_allclose(
        float(out["total"]), cls_want + box_want, rtol=1e-5
    )


def test_zsg_loss_ignore_band_excluded(rng):
    att, reg, labels, reg_t = _setup_loss_batch(rng)
    # Flipping an ignored anchor's logit must not change the loss.
    ign = np.argwhere(labels == -1)
    assert len(ign) > 0
    b, a = ign[0]
    out1 = losses.zsg_loss(jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t))
    att2 = att.copy()
    att2[b, a] += 100.0
    out2 = losses.zsg_loss(jnp.asarray(att2), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t))
    np.testing.assert_allclose(float(out1["total"]), float(out2["total"]), rtol=1e-6)


def test_zsg_loss_bce_and_softmax_variants(rng):
    att, reg, labels, reg_t = _setup_loss_batch(rng)
    args = (jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t))
    out_bce = losses.zsg_loss(*args, use_focal=False)
    out_sm = losses.zsg_loss(*args, use_softmax=True)
    assert np.isfinite(float(out_bce["total"]))
    assert np.isfinite(float(out_sm["total"]))
    assert float(out_bce["total"]) != float(out_sm["total"])


def test_zsg_loss_bf16_inputs_fp32_result(rng):
    att, reg, labels, reg_t = _setup_loss_batch(rng)
    out = losses.zsg_loss(
        jnp.asarray(att, dtype=jnp.bfloat16),
        jnp.asarray(reg, dtype=jnp.bfloat16),
        jnp.asarray(labels),
        jnp.asarray(reg_t),
    )
    assert out["total"].dtype == jnp.float32


def test_zsg_loss_sample_weight_subset_equality(rng):
    """sample_weight 0/1 mask ≡ running the loss on the kept subset —
    for every variant (focal, BCE, softmax). The masked samples drop out
    of every term AND of the positive-count normalizer (grouped
    multi-query wrap-repeats / eval tail pads are masked this way)."""
    att, reg, labels, reg_t = _setup_loss_batch(rng, B=6)
    keep = np.array([1, 0, 1, 1, 0, 1], np.float32)
    sub = keep.astype(bool)
    for kw in (
        dict(),
        dict(use_focal=False),
        dict(use_softmax=True),
    ):
        got = losses.zsg_loss(
            jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels),
            jnp.asarray(reg_t), sample_weight=jnp.asarray(keep), **kw
        )
        want = losses.zsg_loss(
            jnp.asarray(att[sub]), jnp.asarray(reg[sub]),
            jnp.asarray(labels[sub]), jnp.asarray(reg_t[sub]), **kw
        )
        for k in ("total", "cls_ls", "box_ls", "num_pos"):
            np.testing.assert_allclose(
                float(got[k]), float(want[k]), rtol=1e-5, err_msg=f"{kw}:{k}"
            )


def test_zsg_loss_sample_weight_ones_is_identity(rng):
    att, reg, labels, reg_t = _setup_loss_batch(rng)
    args = (jnp.asarray(att), jnp.asarray(reg), jnp.asarray(labels), jnp.asarray(reg_t))
    base = losses.zsg_loss(*args)
    ones = losses.zsg_loss(*args, sample_weight=jnp.ones((att.shape[0],)))
    for k in ("total", "cls_ls", "box_ls", "num_pos"):
        assert float(base[k]) == float(ones[k]), k

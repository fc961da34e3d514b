"""int8 serving quantization (models/quant.py).

Covers: QuantizableConv == nn.Conv in 'off' mode (same params, same
output), calibration records activation ranges, int8 conv error bounds,
full-model calibrate→int8 agreement with the bf16 path, and the Grounder
quantize flow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from zsgnet_tpu.config import Config
from zsgnet_tpu.models.quant import QuantizableConv
from zsgnet_tpu.models.zsgnet import ZSGNet


def tiny_cfg(**kw):
    base = dict(
        resize_img=(64, 64), lstm_dim=16, emb_dim=8, max_qlen=6,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
    )
    base.update(kw)
    return Config(**base)


def make_batch(rng, cfg, b=2, vocab=50):
    h, w = cfg.resize_img
    return {
        "img": jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32)),
        "qvec": jnp.asarray(rng.integers(1, vocab, size=(b, cfg.max_qlen)).astype(np.int32)),
        "qlens": jnp.asarray(
            rng.integers(2, cfg.max_qlen + 1, size=(b,)).astype(np.int32)
        ),
    }


def test_quantizable_conv_off_matches_nn_conv(rng):
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 8)).astype(np.float32))
    kw = dict(features=16, kernel_size=(3, 3), strides=(1, 1),
              padding=[(1, 1), (1, 1)], dtype=jnp.float32, param_dtype=jnp.float32)
    ref = nn.Conv(**kw)
    v = ref.init(jax.random.PRNGKey(0), x)
    got = QuantizableConv(mode="off", **kw).apply(v, x)  # same param tree
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref.apply(v, x)))


def test_calibrate_then_int8_bounds_error(rng):
    x = jnp.asarray((rng.normal(size=(2, 9, 9, 16)) * 3).astype(np.float32))
    kw = dict(features=32, kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
              dtype=jnp.float32, param_dtype=jnp.float32)
    conv = QuantizableConv(mode="calib", **kw)
    v = conv.init(jax.random.PRNGKey(0), x)
    want, qvars = conv.apply(v, x, mutable=["quant"])
    absmax = float(jax.tree.leaves(qvars["quant"])[0])
    assert abs(absmax - float(jnp.max(jnp.abs(x)))) < 1e-5

    got = QuantizableConv(mode="int8", **kw).apply({**v, **qvars}, x)
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    # int8 per-tensor activations x per-channel weights: ~1% relative
    assert err.max() / scale < 0.03
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.999


@pytest.mark.slow
def test_full_model_int8_agrees_with_bf16_decode(rng):
    """calibrate → int8: the decoded best box matches the fp path's on
    nearly all samples (same weights, random init — the hard case since
    uncalibrated ranges vary wildly across depth)."""
    from zsgnet_tpu.models.zsgnet import anchor_components_for
    from zsgnet_tpu.ops.level_ops import decode_best_box_levels

    cfg = tiny_cfg()
    batch = make_batch(rng, cfg, b=8)
    model = ZSGNet(cfg=cfg, vocab_size=50)
    v = model.init(jax.random.PRNGKey(1), batch)
    out_fp = model.apply(v, batch)

    calib = ZSGNet(cfg=cfg.replace(quant_mode="calib"), vocab_size=50)
    _, qvars = calib.apply(v, batch, mutable=["quant"])
    mi = ZSGNet(cfg=cfg.replace(quant_mode="int8"), vocab_size=50)
    out_i8 = mi.apply({**v, "quant": qvars["quant"]}, batch)

    corr = np.corrcoef(
        np.asarray(out_fp["att_out"]).ravel(), np.asarray(out_i8["att_out"]).ravel()
    )[0, 1]
    assert corr > 0.99

    comps = anchor_components_for(cfg)
    box_fp, _ = decode_best_box_levels(out_fp["att_levels"], out_fp["delta_levels"], comps)
    box_i8, _ = decode_best_box_levels(out_i8["att_levels"], out_i8["delta_levels"], comps)
    from zsgnet_tpu.ops.boxes import iou_pairwise

    iou = np.asarray(iou_pairwise(jnp.asarray(box_fp), jnp.asarray(box_i8)))
    iou = np.diagonal(iou) if iou.ndim == 2 else iou
    assert (iou > 0.8).mean() >= 0.75, f"int8 decode diverged: IoU {iou}"


def test_grounder_quantize_flow(rng, tmp_path):
    """Grounder(quantize=True) calibrates on the first batch at
    throughput batch sizes, and deliberately stays bf16 in canvas-mode
    latency serving (B≤16 — int8 measured slower there; BASELINE.md)."""
    from zsgnet_tpu.data.vocab import Vocab
    from zsgnet_tpu.predict import Grounder

    cfg = tiny_cfg()
    vocab = Vocab.build(["the red box", "a green ellipse"])
    model = ZSGNet(cfg=cfg, vocab_size=len(vocab))
    batch = make_batch(rng, cfg, b=2, vocab=len(vocab))
    v = model.init(jax.random.PRNGKey(0), batch)
    h, w = cfg.resize_img
    imgs = [rng.integers(0, 255, (h, w, 3)).astype(np.uint8) for _ in range(2)]
    queries = ["the red box", "a green ellipse"]

    # throughput batch: quantized flow with first-batch calibration
    g = Grounder(cfg, vocab, dict(v), batch_size=32, quantize=True)
    res = g.ground(imgs, queries)
    assert len(res) == 2 and "quant" in g.variables
    assert all(np.isfinite(r["score"]) for r in res)
    qv = g.variables["quant"]
    g.ground(imgs, queries)  # second call reuses the calibration
    assert g.variables["quant"] is qv

    # latency batch: canvas mode wins in bf16 — quantize is ignored
    g2 = Grounder(cfg, vocab, dict(v), batch_size=2, quantize=True)
    assert not g2.quantize and g2.cfg.head_canvas
    res2 = g2.ground(imgs, queries)
    assert len(res2) == 2 and "quant" not in g2.variables


@pytest.mark.slow
def test_ssd_int8_mode(rng):
    """SSD backbone quantizes too (incl. the dilated conv6)."""
    cfg = tiny_cfg(mdl_to_use="ssd_vgg", resize_img=(96, 96))
    batch = make_batch(rng, cfg, b=2)
    model = ZSGNet(cfg=cfg, vocab_size=50)
    v = model.init(jax.random.PRNGKey(0), batch)
    out_fp = model.apply(v, batch)
    calib = ZSGNet(cfg=cfg.replace(quant_mode="calib"), vocab_size=50)
    _, qvars = calib.apply(v, batch, mutable=["quant"])
    mi = ZSGNet(cfg=cfg.replace(quant_mode="int8"), vocab_size=50)
    out_i8 = mi.apply({**v, "quant": qvars["quant"]}, batch)
    corr = np.corrcoef(
        np.asarray(out_fp["att_out"]).ravel(), np.asarray(out_i8["att_out"]).ravel()
    )[0, 1]
    assert corr > 0.99

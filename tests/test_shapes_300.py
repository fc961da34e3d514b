"""Pyramid-shape contracts at the canonical 300² config via jax.eval_shape.

eval_shape traces without computing, so the full-size model costs
milliseconds here — this pins that ``feature_map_sizes`` /
``ssd_feature_map_sizes`` exactly match the convnets' real output shapes
(the anchor pyramid and flattened head outputs depend on it).
"""

import jax
import numpy as np

from zsgnet_tpu.config import Config
from zsgnet_tpu.models.ssd_vgg import ssd_feature_map_sizes
from zsgnet_tpu.models.zsgnet import ZSGNet
from zsgnet_tpu.ops import anchors as anchor_ops


def _shapes_for(cfg, vocab=100, B=2):
    model = ZSGNet(cfg=cfg, vocab_size=vocab)
    h, w = cfg.resize_img
    batch = {
        "img": jax.ShapeDtypeStruct((B, h, w, 3), np.float32),
        "qvec": jax.ShapeDtypeStruct((B, cfg.max_qlen), np.int32),
        "qlens": jax.ShapeDtypeStruct((B,), np.int32),
    }

    def init_and_apply(batch):
        vs = model.init(jax.random.PRNGKey(0), batch, train=False)
        return model.apply(vs, batch, train=False)

    return jax.eval_shape(init_and_apply, batch)


def test_retina_300_shapes():
    cfg = Config(resize_img=(300, 300))
    out = _shapes_for(cfg)
    sizes = anchor_ops.feature_map_sizes((300, 300))
    total = sum(h * w for h, w in sizes) * cfg.num_anchors
    assert total == 17451
    assert out["att_out"].shape == (2, total)
    assert out["bbx_out"].shape == (2, total, 4)


def test_ssd_300_shapes():
    cfg = Config(resize_img=(300, 300), mdl_to_use="ssd_vgg")
    out = _shapes_for(cfg)
    sizes = ssd_feature_map_sizes((300, 300))
    assert sizes == ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))
    total = sum(h * w for h, w in sizes) * cfg.num_anchors
    assert out["att_out"].shape == (2, total)


def test_retina_600_shapes():
    # The reference also runs 600² inputs (cfg.resize_img switch).
    cfg = Config(resize_img=(600, 600))
    out = _shapes_for(cfg)
    sizes = anchor_ops.feature_map_sizes((600, 600))
    total = sum(h * w for h, w in sizes) * cfg.num_anchors
    assert out["att_out"].shape == (2, total)

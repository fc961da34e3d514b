"""ZSGNet — single-stage visual grounding model, flax/XLA-native.

Capability parity with the reference's ``code/mdl.py`` ``ZSGNet``
(SURVEY.md §2 item 7, §3.3): backbone multi-scale features + BiLSTM query
vector, language broadcast + normalized-coordinate-grid concat per scale,
shared conv prediction head emitting per-anchor (1 score + 4 box deltas),
flattened and concatenated across scales.

TPU-first design decisions (vs the reference's per-scale Python loop over
torch convs):

  * NHWC everywhere; concat on the trailing (channel/lane) axis is a
    layout-friendly VPU op;
  * the per-scale loop is unrolled at trace time over a *static* list of
    pyramid shapes — XLA sees 5 fused conv pipelines, no dynamic shapes;
  * the coordinate grids are compile-time constants (from
    ``ops.anchors.create_grid``) baked into the program;
  * the head is shared across scales (``use_same_atb`` — reference
    default), so its weights are reused by all 5 compiled conv calls;
  * outputs are (B, ΣHWA, 1+4) — anchor-major flattening matching
    ``ops.anchors.create_anchors`` ordering (level-major, then row-major
    cells, then anchor-within-cell), which the loss/eval rely on.

The head's final bias is initialized to the RetinaNet focal prior
(-log((1-π)/π), π=0.01) so early training doesn't drown in negatives.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.config import Config
from zsgnet_tpu.models.bilstm import BiLSTMEncoder
from zsgnet_tpu.models.fpn import FPN
from zsgnet_tpu.models.resnet import ResNet50
from zsgnet_tpu.models.ssd_vgg import SSDVGG16
from zsgnet_tpu.ops import anchors as anchor_ops

Array = jnp.ndarray

FOCAL_PRIOR_BIAS = -math.log((1.0 - 0.01) / 0.01)


class PredictionHead(nn.Module):
    """Shared 4×(conv3×3+ReLU) + conv3×3 → A·5 channels per cell."""

    num_anchors: int
    mid_ch: int = 256
    depth: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = lambda f, name, binit: nn.Conv(  # noqa: E731
            f, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            param_dtype=jnp.float32, name=name, bias_init=binit,
        )
        for i in range(self.depth):
            x = nn.relu(conv(self.mid_ch, f"conv{i}", nn.initializers.zeros_init())(x))
        # Final conv: per-anchor [score, dy, dx, dh, dw]; score bias = focal prior.
        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[0 :: 5].set(FOCAL_PRIOR_BIAS)

        return conv(self.num_anchors * 5, "out", bias_init)(x)


class ZSGNet(nn.Module):
    """Image + query → per-anchor scores and box deltas.

    Input dict (static shapes): ``img`` (B, H, W, 3) float, ``qvec``
    (B, T) int32, ``qlens`` (B,) int32.
    Output dict: ``att_out`` (B, A) score logits, ``bbx_out`` (B, A, 4)
    regression deltas, plus ``feat_sizes`` / ``num_f_out`` metadata the
    reference also returns (here: static Python values).
    """

    cfg: Config
    vocab_size: int

    @nn.compact
    def __call__(self, inp: dict[str, Array], train: bool = False) -> dict[str, Any]:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # --- visual stream ---
        if cfg.mdl_to_use == "retina":
            c_feats = ResNet50(
                dtype=dtype, remat=cfg.remat_backbone,
                bn_axis=cfg.bn_sync_axis or None, name="backbone",
            )(inp["img"], train)
            feats = FPN(out_ch=cfg.fpn_ch, dtype=dtype, name="fpn")(c_feats)
        elif cfg.mdl_to_use == "ssd_vgg":
            feats = SSDVGG16(dtype=dtype, name="backbone")(inp["img"], train)
        else:
            raise ValueError(f"unknown mdl_to_use: {cfg.mdl_to_use}")

        # --- language stream ---
        q_vec = BiLSTMEncoder(
            vocab_size=self.vocab_size,
            emb_dim=cfg.emb_dim,
            hidden=cfg.lstm_dim,
            dtype=dtype,
            name="query_enc",
        )(inp["qvec"], inp["qlens"])  # (B, 2H)

        # --- fusion + head, per scale (static unroll) ---
        head = PredictionHead(
            num_anchors=cfg.num_anchors, mid_ch=cfg.head_ch, dtype=dtype, name="head"
        )
        heads = [head] * len(feats) if cfg.use_same_atb else [
            PredictionHead(
                num_anchors=cfg.num_anchors, mid_ch=cfg.head_ch, dtype=dtype,
                name=f"head{i}",
            )
            for i in range(len(feats))
        ]

        att_parts, bbx_parts, feat_sizes = [], [], []
        for level, f in enumerate(feats):
            b, h, w, c = f.shape
            feat_sizes.append((h, w))
            lang = jnp.broadcast_to(q_vec[:, None, None, :], (b, h, w, q_vec.shape[-1]))
            grid = jnp.asarray(
                anchor_ops.create_grid((h, w), flatten=False), dtype=dtype
            )  # (H, W, 2) compile-time constant
            grid = jnp.broadcast_to(grid[None], (b, h, w, 2))
            fused = jnp.concatenate([f, lang.astype(dtype), grid], axis=-1)
            out = heads[level](fused)  # (B, H, W, A*5)
            out = out.reshape(b, h * w * cfg.num_anchors, 5).astype(jnp.float32)
            att_parts.append(out[..., 0])
            bbx_parts.append(out[..., 1:])

        return {
            "att_out": jnp.concatenate(att_parts, axis=1),  # (B, ΣHWA)
            "bbx_out": jnp.concatenate(bbx_parts, axis=1),  # (B, ΣHWA, 4)
            "feat_sizes": tuple(feat_sizes),
            "num_f_out": len(feats),
        }


def get_default_net(cfg: Config, vocab_size: int | None = None) -> ZSGNet:
    """Reference-API-compatible constructor (``get_default_net`` in mdl.py)."""
    vs = vocab_size or cfg.vocab_size or 10000
    return ZSGNet(cfg=cfg, vocab_size=vs)


def anchor_pyramid_for(cfg: Config) -> np.ndarray:
    """The (A, 4) cthw anchor constant matching ZSGNet's output ordering."""
    if cfg.mdl_to_use == "retina":
        sizes = anchor_ops.feature_map_sizes(cfg.resize_img)
    else:
        from zsgnet_tpu.models.ssd_vgg import ssd_feature_map_sizes

        sizes = ssd_feature_map_sizes(cfg.resize_img)
    return anchor_ops.create_anchors(cfg.scales, cfg.ratios, sizes)

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
import jax
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
    """Shared fusion head: 4×(conv3×3+ReLU) + conv3×3 → A·5 per cell.

    Two TPU-first deviations from the reference's "concat then conv"
    formulation — both **mathematically exact** reparameterizations:

    1. The first conv's kernel is logically over the concatenated
       [visual(Cv) | language(Cl) | grid(2)] input, but is *evaluated
       decomposed*: conv(vis) + lang-term + conv(grid-const). Because the
       language vector is spatially constant, its 3×3-conv contribution is
       9 matvecs (B, 3, 3, mid) plus border-mask corrections (zero-pad
       edges see fewer taps) — removing Cl/(Cv+Cl+2) ≈ ⅔ of the conv
       FLOPs at every cell AND never materializing the (B, H, W, 770)
       concat in HBM. The parameter is stored as the full
       (3, 3, Cv+Cl+2, mid) kernel in the reference channel order, so
       checkpoints are interchangeable with the naive formulation
       (equality-tested in tests/test_model.py).
    2. Output channels are component-grouped [score·A | dy·A | dx·A |
       dh·A | dw·A] instead of per-anchor interleaved, keeping per-level
       slices relayout-free (see ops/level_ops.py). Use
       ``zsgnet_tpu.convert.regroup_head_kernel`` for reference weights.
    """

    num_anchors: int
    vis_ch: int = 256
    lang_ch: int = 512
    mid_ch: int = 256
    depth: int = 4
    dtype: Any = jnp.bfloat16
    quant_mode: str = "off"  # int8 serving for conv1..out; see models/quant.py

    @nn.compact
    def __call__(
        self,
        vis: Array,
        lang_vec: Array,
        grid: Array,
        border_masks: dict[str, Array] | None = None,
        occupancy: Array | None = None,
    ) -> Array:
        """vis: (B, H, W, Cv); lang_vec: (B, Cl) — or (B, Q, Cl) for
        GROUPED multi-query mode; grid: (H, W, 2) const.

        Grouped mode (``cfg.queries_per_img`` — VERDICT r3 missing #4):
        each image carries Q queries. The conv0 visual term and the grid
        term are computed ONCE per image and broadcast against the
        per-(image, query) language term — output (B·Q, H, W, A·5),
        pair-major (image-major, query-minor). Exactly the math of
        tiling every image Q times (the broadcast is the same mechanism
        ``Grounder.ground_image`` uses at batch-1 serving), so grads
        equal the naive repeated-image batch — tested in
        tests/test_multiquery.py. Only convs 1..out pay per pair; the
        backbone (the FLOP bulk) pays per image.

        Canvas mode (``models/canvas.py``): ``vis``/``grid`` are packed
        multi-level canvases, ``border_masks`` supplies per-level border
        indicator maps (H, W) for the language-term corrections, and
        ``occupancy`` (H, W, 1) re-zeroes gap cells after every ReLU.
        Parameters are identical in both modes (checkpoint-interchangeable).
        """
        grouped = lang_vec.ndim == 3
        b, h, w, _ = vis.shape
        in_ch = self.vis_ch + self.lang_ch + 2
        kernel = self.param(
            "conv0_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_ch, self.mid_ch),
            jnp.float32,
        ).astype(self.dtype)
        bias0 = self.param(
            "conv0_bias", nn.initializers.zeros_init(), (self.mid_ch,), jnp.float32
        ).astype(self.dtype)
        k_vis = kernel[:, :, : self.vis_ch]
        k_lang = kernel[:, :, self.vis_ch : self.vis_ch + self.lang_ch]
        k_grid = kernel[:, :, self.vis_ch + self.lang_ch :]

        dn = ("NHWC", "HWIO", "NHWC")
        from zsgnet_tpu.models.quant import parse_quant_mode

        qbase, qpct = parse_quant_mode(self.quant_mode)
        if qbase in ("calib", "int8"):
            # int8 serving for the decomposed conv0's vis term (the only
            # head conv the QuantizableConv wrapper can't cover, since the
            # kernel is a slice of the shared concat-ordered parameter).
            # Same recipe as models/quant.py: per-tensor activation scale
            # (calibrated across all pyramid levels — the module is shared,
            # so the variable is too), per-out-channel weight scale.
            from zsgnet_tpu.models.quant import _quantize_sym

            absmax = self.variable(
                "quant", f"vis_absmax_{vis.shape[1]}x{vis.shape[2]}",
                lambda: jnp.zeros((), jnp.float32),
            )
            if qbase == "calib":
                if not self.is_initializing():
                    a = jnp.abs(vis.astype(jnp.float32))
                    stat = (
                        jnp.quantile(a.reshape(-1), qpct)
                        if qpct < 1.0
                        else jnp.max(a)
                    )
                    absmax.value = jnp.maximum(absmax.value, stat)
                y = jax.lax.conv_general_dilated(
                    vis.astype(self.dtype), k_vis, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn, preferred_element_type=self.dtype,
                )
            else:
                act_scale = jnp.maximum(absmax.value, 1e-6) / 127.0
                kv32 = k_vis.astype(jnp.float32)
                w_scale = jnp.maximum(
                    jnp.max(jnp.abs(kv32), axis=(0, 1, 2), keepdims=True), 1e-12
                ) / 127.0
                y32 = jax.lax.conv_general_dilated(
                    _quantize_sym(vis.astype(jnp.float32), act_scale),
                    _quantize_sym(kv32, w_scale),
                    (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn, preferred_element_type=jnp.int32,
                )
                y = (y32.astype(jnp.float32) * (act_scale * w_scale[0, 0, 0])).astype(
                    self.dtype
                )
        else:
            y = jax.lax.conv_general_dilated(
                vis.astype(self.dtype), k_vis, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=dn, preferred_element_type=self.dtype,
            )
        # Grid term: batch-independent (grid is a compile-time constant).
        g = jax.lax.conv_general_dilated(
            grid.astype(self.dtype)[None], k_grid, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=self.dtype,
        )  # (1, H, W, mid)
        # Language term: 9 tap matvecs + zero-pad border corrections.
        # Grouped mode carries an extra query axis q through the taps;
        # the einsum/broadcast shapes are the only difference.
        u = jnp.einsum(
            "...c,yxcd->...yxd", lang_vec.astype(self.dtype), k_lang,
            preferred_element_type=self.dtype,
        )  # (..., 3, 3, mid); tap (dy+1, dx+1)
        full = jnp.sum(u, axis=(-3, -2))  # all 9 taps (interior cells)
        top = jnp.sum(u[..., 0, :, :], axis=-2)   # Σ_dx u[dy=0, dx]
        bot = jnp.sum(u[..., 2, :, :], axis=-2)
        left = jnp.sum(u[..., :, 0, :], axis=-2)  # Σ_dy u[dy, dx=0]
        right = jnp.sum(u[..., :, 2, :], axis=-2)
        nb = 2 if grouped else 1  # leading broadcast dims of the masks
        if border_masks is None:
            ar = lambda m: m.astype(self.dtype)  # noqa: E731
            is_top = ar(jnp.arange(h) == 0).reshape((1,) * nb + (h, 1, 1))
            is_bot = ar(jnp.arange(h) == h - 1).reshape((1,) * nb + (h, 1, 1))
            is_l = ar(jnp.arange(w) == 0).reshape((1,) * nb + (1, w, 1))
            is_r = ar(jnp.arange(w) == w - 1).reshape((1,) * nb + (1, w, 1))
        else:  # canvas mode: per-level borders as (H, W) constants
            to4 = lambda m: m.astype(self.dtype).reshape(  # noqa: E731
                (1,) * nb + (h, w, 1)
            )
            is_top, is_bot = to4(border_masks["is_top"]), to4(border_masks["is_bot"])
            is_l, is_r = to4(border_masks["is_left"]), to4(border_masks["is_right"])
        bc = lambda v: v[..., None, None, :]  # noqa: E731
        lang_term = (
            bc(full)
            - is_top * bc(top) - is_bot * bc(bot)
            - is_l * bc(left) - is_r * bc(right)
            + is_top * is_l * bc(u[..., 0, 0, :]) + is_top * is_r * bc(u[..., 0, 2, :])
            + is_bot * is_l * bc(u[..., 2, 0, :]) + is_bot * is_r * bc(u[..., 2, 2, :])
        )
        occ = None if occupancy is None else occupancy.astype(self.dtype)[None]
        rezero = (lambda v: v) if occ is None else (lambda v: v * occ)  # noqa: E731
        if grouped:
            # y, g: per-image; lang_term: per-(image, query) → broadcast
            # over the query axis, then flatten pair-major for the convs.
            qn = lang_vec.shape[1]
            x = nn.relu(y[:, None] + g[None] + lang_term + bias0)
            x = rezero(x.reshape(b * qn, h, w, self.mid_ch))
        else:
            x = rezero(nn.relu(y + g + lang_term + bias0))

        from zsgnet_tpu.models.quant import conv_for

        conv = lambda f, name, binit: conv_for(  # noqa: E731
            self.quant_mode, features=f, kernel_size=(3, 3),
            padding=[(1, 1), (1, 1)], dtype=self.dtype,
            param_dtype=jnp.float32, name=name, bias_init=binit,
        )
        for i in range(1, self.depth):
            x = rezero(nn.relu(conv(self.mid_ch, f"conv{i}", nn.initializers.zeros_init())(x)))
        # Score block (first A channels) starts at the focal prior.
        a = self.num_anchors

        def bias_init(key, shape, dtype=jnp.float32):
            bb = jnp.zeros(shape, dtype)
            return bb.at[:a].set(FOCAL_PRIOR_BIAS)

        return conv(a * 5, "out", bias_init)(x)


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
    def __call__(
        self, inp: dict[str, Array], train: bool = False, spatial=None
    ) -> dict[str, Any]:
        """``spatial`` (parallel.halo.SpatialCtx | None): manual spatial
        partitioning under shard_map — ``img`` arrives height-sharded
        over the spatial mesh axis, the backbone halo-exchanges and
        reshards (gather height / split batch), and every output carries
        batch B/S: this member's batch block (the caller slices
        annotations the same way via ``SpatialCtx.slice_batch``).
        BatchNorm then syncs over BOTH mesh axes so the math equals the
        global single-device batch. Retina-only: ssd_vgg trains exactly
        under GSPMD already (parallel/halo.py::spatial_train_mode)."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if spatial is not None and cfg.mdl_to_use != "retina":
            raise NotImplementedError(
                "halo spatial partitioning is retina-only; ssd_vgg uses the "
                "(measured-exact) GSPMD path"
            )

        # uint8 input → fused on-device ImageNet normalization (fp32, so
        # numerics match host-side normalization exactly; tested).
        if inp["img"].dtype == jnp.uint8:
            from zsgnet_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

            img = (inp["img"].astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            inp = dict(inp, img=img)

        # --- visual stream ---
        # Under halo spatial partitioning BN must sync over BOTH axes:
        # before the reshard point, spatial-group members hold different
        # ROWS of the same samples — per-shard moments there would
        # normalize one sample's rows inconsistently (not even DDP-style
        # semantics), so the sync is forced, matching GSPMD's global math.
        bn_ax = (
            (cfg.data_axis, cfg.spatial_axis)
            if spatial is not None
            else (cfg.bn_sync_axis or None)
        )
        if cfg.mdl_to_use == "retina":
            bb = ResNet50(
                dtype=dtype, remat=cfg.remat_backbone,
                bn_axis=bn_ax, spd_stem=cfg.spd_stem,
                bn_variance=cfg.bn_variance, quant_mode=cfg.quant_mode,
                name="backbone",
            )
            fpn = FPN(
                out_ch=cfg.fpn_ch, dtype=dtype, quant_mode=cfg.quant_mode,
                name="fpn",
            )
            if spatial is not None:
                c_feats, sh_flags = bb(inp["img"], train, spatial)
                feats = fpn(c_feats, spatial=spatial, shard_flags=sh_flags)
            else:
                feats = fpn(bb(inp["img"], train))
        elif cfg.mdl_to_use == "ssd_vgg":
            feats = SSDVGG16(
                out_ch=cfg.fpn_ch, uniform_proj=cfg.ssd_uniform_proj,
                dtype=dtype, quant_mode=cfg.quant_mode, name="backbone",
            )(inp["img"], train)
        else:
            raise ValueError(f"unknown mdl_to_use: {cfg.mdl_to_use}")

        # --- language stream ---
        qvec, qlens = inp["qvec"], inp["qlens"]
        if spatial is not None:
            # The visual stream resharded to this member's batch block;
            # take the matching block of the (spatially-replicated) queries.
            qvec = spatial.slice_batch(qvec)
            qlens = spatial.slice_batch(qlens)
        # Grouped multi-query mode: qvec (B, Q, T) / qlens (B, Q) — each
        # image carries Q phrases (cfg.queries_per_img). The BiLSTM runs
        # per pair; the backbone above ran once per IMAGE; the head
        # broadcasts (PredictionHead grouped mode). Outputs are
        # (B·Q, ...) pair-major — identical math to repeating each image
        # Q times in a flat batch (tests/test_multiquery.py).
        grouped_q = qvec.ndim == 3
        if grouped_q:
            b_img, q_per = qvec.shape[:2]
            qvec = qvec.reshape(b_img * q_per, qvec.shape[2])
            qlens = qlens.reshape(b_img * q_per)
        q_vec = BiLSTMEncoder(
            vocab_size=self.vocab_size,
            emb_dim=cfg.emb_dim,
            hidden=cfg.lstm_dim,
            dtype=dtype,
            name="query_enc",
        )(qvec, qlens)  # (B[*Q], 2H)
        if grouped_q:
            q_vec = q_vec.reshape(b_img, q_per, -1)

        # --- fusion + head, per scale (static unroll) ---
        # A single head is shared across scales (use_same_atb, reference
        # default) only when every scale has the same channel count; the
        # reference-interface SSD mode feeds native per-scale channels
        # (512/1024/…), whose first convs differ in shape → per-scale heads.
        head_kw = dict(
            num_anchors=cfg.num_anchors, lang_ch=cfg.lang_dim,
            mid_ch=cfg.head_ch, dtype=dtype,
            # The shared head sees all 5 pyramid levels through ONE
            # activation scale; cfg.quant_head=False keeps it fp.
            quant_mode=cfg.quant_mode if cfg.quant_head else "off",
        )
        same_ch = len({f.shape[-1] for f in feats}) == 1
        if cfg.use_same_atb and same_ch:
            head = PredictionHead(**head_kw, vis_ch=feats[0].shape[-1], name="head")
            heads = [head] * len(feats)
        else:
            heads = [
                PredictionHead(**head_kw, vis_ch=f.shape[-1], name=f"head{i}")
                for i, f in enumerate(feats)
            ]

        a = cfg.num_anchors
        feat_sizes = [f.shape[1:3] for f in feats]
        if cfg.head_canvas and cfg.use_same_atb and same_ch:
            # Canvas mode (DESIGN.md roadmap #3): all levels packed into one
            # zero-separated canvas, the shared head runs ONCE per conv
            # layer instead of once per level. Exact — see models/canvas.py.
            from zsgnet_tpu.models.canvas import canvas_constants, pack_levels

            layout = pack_levels(feat_sizes)
            consts = canvas_constants(layout)
            b = feats[0].shape[0]
            canvas = jnp.zeros(
                (b, layout.height, layout.width, feats[0].shape[-1]), dtype
            )
            for f, (r, c), (h, w) in zip(feats, layout.offsets, layout.sizes):
                canvas = canvas.at[:, r : r + h, c : c + w, :].set(f.astype(dtype))
            out = heads[0](
                canvas,
                q_vec,
                jnp.asarray(consts["grid"], dtype),
                border_masks={
                    k: jnp.asarray(consts[k])
                    for k in ("is_top", "is_bot", "is_left", "is_right")
                },
                occupancy=jnp.asarray(consts["occupancy"]),
            ).astype(jnp.float32)  # (B, CH, CW, A*5)
            level_outs = [
                out[:, r : r + h, c : c + w, :]
                for (r, c), (h, w) in zip(layout.offsets, layout.sizes)
            ]
        else:
            level_outs = []
            for level, f in enumerate(feats):
                h, w = feat_sizes[level]
                grid = jnp.asarray(
                    anchor_ops.create_grid((h, w), flatten=False), dtype=dtype
                )  # (H, W, 2) compile-time constant
                level_outs.append(
                    heads[level](f, q_vec, grid).astype(jnp.float32)
                )  # (B, H, W, A*5)

        att_levels, delta_levels = [], []
        for out in level_outs:
            # Component-grouped channel ranges — native-layout slices.
            att_levels.append(out[..., :a])  # (B, H, W, A)
            delta_levels.append(
                tuple(out[..., (k + 1) * a : (k + 2) * a] for k in range(4))
            )

        # Flat reference-contract views (B, ΣHWA[,4]) — anchor index
        # ((y·W + x)·A + a), matching ops.anchors.create_anchors ordering.
        # Consumers that only use the per-level outputs never pay for
        # these: XLA dead-code-eliminates unused jit outputs.
        att_flat = jnp.concatenate(
            [al.reshape(al.shape[0], -1) for al in att_levels], axis=1
        )
        bbx_flat = jnp.concatenate(
            [
                jnp.stack([d.reshape(d.shape[0], -1) for d in dl], axis=-1)
                for dl in delta_levels
            ],
            axis=1,
        )

        return {
            "att_out": att_flat,  # (B, ΣHWA)
            "bbx_out": bbx_flat,  # (B, ΣHWA, 4)
            "att_levels": tuple(att_levels),
            "delta_levels": tuple(delta_levels),
            "feat_sizes": tuple(feat_sizes),
            "num_f_out": len(feats),
        }


def get_default_net(cfg: Config, vocab_size: int | None = None) -> ZSGNet:
    """Reference-API-compatible constructor (``get_default_net`` in mdl.py)."""
    vs = vocab_size or cfg.vocab_size or 10000
    return ZSGNet(cfg=cfg, vocab_size=vs)


def pyramid_sizes_for(cfg: Config) -> tuple[tuple[int, int], ...]:
    if cfg.mdl_to_use == "retina":
        return anchor_ops.feature_map_sizes(cfg.resize_img)
    from zsgnet_tpu.models.ssd_vgg import ssd_feature_map_sizes

    return ssd_feature_map_sizes(cfg.resize_img)


def anchor_pyramid_for(cfg: Config) -> np.ndarray:
    """The (A, 4) cthw anchor constant matching ZSGNet's output ordering."""
    return anchor_ops.create_anchors(cfg.scales, cfg.ratios, pyramid_sizes_for(cfg))


def anchor_components_for(cfg: Config) -> list[dict[str, np.ndarray]]:
    """Per-level (H, W, A) anchor component constants (level hot path)."""
    from zsgnet_tpu.ops.level_ops import level_anchor_components

    return level_anchor_components(cfg.scales, cfg.ratios, pyramid_sizes_for(cfg))

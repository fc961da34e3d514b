"""torch→flax weight conversion — checkpoint-compatibility with the reference.

BASELINE.json's north star requires "checkpoint-convertible weights": a
user holding (a) torchvision ImageNet ResNet-50 weights or (b) a trained
reference ZSGNet checkpoint must be able to load them here. This module
converts torch ``state_dict``-style mappings (as produced by
``torch.load(...)`` on CPU — torch 2.13+cpu is installed; no torchvision
needed, only the tensor dict) into our flax parameter pytrees.

Layout rules (the SURVEY.md §7 "hard parts" this module pins down):
  * torch Conv2d weight (O, I, kH, kW) → flax NHWC kernel (kH, kW, I, O);
  * torch Linear weight (O, I) → flax kernel (I, O);
  * BatchNorm: weight/bias → scale/bias params; running_mean/var →
    batch_stats collection; eps/momentum match (1e-5 / 0.9);
  * LSTM: torch weight_ih_l0 (4H, E) with gate order (i, f, g, o) →
    our ``w_ih`` (E, 4H) — same gate order by construction
    (models/bilstm.py), so conversion is a transpose; torch's two bias
    vectors sum into our single ``bias``;
  * Embedding: identical layout (V, E).

Verification: tests/test_convert.py rebuilds torchvision's ResNet-50
architecture in pure torch, converts random weights, and asserts
flax forward == torch forward to ≤1e-4 (fp32, eval mode).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Tensor = Any  # torch.Tensor without importing torch at module scope


def _np(t: Tensor) -> np.ndarray:
    # .copy() matters: .numpy() SHARES storage with the live torch tensor,
    # so converting a model and then training it (in-place optimizer
    # updates) would silently mutate the "converted" checkpoint.
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy().copy()
    return np.array(t)


def conv_kernel(t: Tensor) -> np.ndarray:
    """(O, I, kH, kW) → (kH, kW, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def linear_kernel(t: Tensor) -> np.ndarray:
    return _np(t).transpose(1, 0)


def _bn(sd: Mapping[str, Tensor], prefix: str) -> tuple[dict, dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet50(
    sd: Mapping[str, Tensor], prefix: str = "", spd_stem: bool = False
) -> tuple[dict, dict]:
    """torchvision resnet50 state_dict → (params, batch_stats) subtrees
    matching ``zsgnet_tpu.models.resnet.ResNet50`` (name=`backbone`
    inside ZSGNet; pass the raw dict rooted at the resnet, e.g. strip a
    ``backbone.`` prefix first via ``prefix=``).

    Ignores the torchvision ``fc.*`` classifier head (ZSGNet taps
    C3/C4/C5 only — reference `RetinaBackBone`, SURVEY.md §2 item 8).
    """
    p = lambda k: f"{prefix}{k}"  # noqa: E731
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    stem_kernel = conv_kernel(sd[p("conv1.weight")])
    if spd_stem:
        # Space-to-depth stem stores the same (7,7,3,64) kernel as a flat
        # leaf (models/resnet.py rearranges it in-graph).
        params["conv1_kernel"] = stem_kernel
    else:
        params["conv1"] = {"kernel": stem_kernel}
    params["bn1"], stats["bn1"] = _bn(sd, p("bn1"))

    stage_sizes = (3, 4, 6, 3)
    for stage_i, n_blocks in enumerate(stage_sizes):
        for block_i in range(n_blocks):
            t_pre = p(f"layer{stage_i + 1}.{block_i}")
            f_name = f"layer{stage_i + 1}_{block_i}"
            blk_p: dict[str, Any] = {}
            blk_s: dict[str, Any] = {}
            for j in (1, 2, 3):
                blk_p[f"conv{j}"] = {"kernel": conv_kernel(sd[f"{t_pre}.conv{j}.weight"])}
                blk_p[f"bn{j}"], blk_s[f"bn{j}"] = _bn(sd, f"{t_pre}.bn{j}")
            if f"{t_pre}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": conv_kernel(sd[f"{t_pre}.downsample.0.weight"])
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _bn(
                    sd, f"{t_pre}.downsample.1"
                )
            params[f_name] = blk_p
            stats[f_name] = blk_s
    return params, stats


def regroup_head_kernel(kernel: np.ndarray, bias: np.ndarray | None, num_anchors: int):
    """Reorder a per-anchor-interleaved head projection into our
    component-grouped channel layout.

    The reference head's final conv emits channels [a0:(score,dy,dx,dh,dw),
    a1:(...), ...] (per-anchor interleave); our ``PredictionHead`` expects
    [score·A | dy·A | dx·A | dh·A | dw·A] (see models/zsgnet.py — the
    grouping keeps per-level slices relayout-free on TPU). kernel:
    (kh, kw, in, A*5) already converted to NHWC by :func:`conv_kernel`.
    """
    a = num_anchors
    perm = np.concatenate([np.arange(k, 5 * a, 5) for k in range(5)])
    k2 = kernel[..., perm]
    b2 = bias[perm] if bias is not None else None
    return k2, b2


# FPN: our flax names (models/fpn.py) → torch module names. The reference's
# FPN derives from the kuangliu/pytorch-retinanet lineage (SURVEY.md §2
# item 8 `FPN_backbone` [L]): latlayer1..3 are the C5/C4/C3 1×1 laterals,
# toplayer* the post-merge 3×3 smooths, conv6/conv7 the P6/P7 strided convs.
# [M]-confidence naming (reference mount empty) — pass a custom map to
# convert_fpn when the real names differ; shapes are always verified.
FPN_NAME_MAP = {
    "lat5": "latlayer1",
    "lat4": "latlayer2",
    "lat3": "latlayer3",
    "smooth5": "toplayer0",
    "smooth4": "toplayer1",
    "smooth3": "toplayer2",
    "p6": "conv6",
    "p7": "conv7",
}

# Expected (in_ch, k) per FPN conv — used to verify a mapped tensor
# actually is the conv we think it is. in_ch None means "equals the FPN
# channel count" (inferred from the kernels, so any fpn_ch converts);
# fixed values are the ResNet-50 C3/C4/C5 widths.
_FPN_SHAPES = {
    "lat5": (2048, 1), "lat4": (1024, 1), "lat3": (512, 1),
    "smooth5": (None, 3), "smooth4": (None, 3), "smooth3": (None, 3),
    "p6": (2048, 3), "p7": (None, 3),
}


def convert_fpn(
    sd: Mapping[str, Tensor],
    prefix: str = "",
    name_map: Mapping[str, str] | None = None,
) -> dict[str, Any]:
    """torch FPN weights → ``models.fpn.FPN`` params subtree.

    Maps per :data:`FPN_NAME_MAP` (override via ``name_map``); entries
    missing from the state dict are skipped, entries whose kernel shape
    contradicts the FPN wiring raise (a silent mis-map would cost silent
    accuracy — SURVEY.md §7 "hard parts").
    """
    name_map = dict(FPN_NAME_MAP if name_map is None else name_map)
    params: dict[str, Any] = {}
    # FPN channel count, inferred from the output dim of every mapped conv
    # (they must all agree).
    fpn_ch = None
    for ours, theirs in name_map.items():
        wk = f"{prefix}{theirs}.weight"
        if wk in sd:
            out_ch = conv_kernel(sd[wk]).shape[3]
            if fpn_ch is not None and out_ch != fpn_ch:
                raise ValueError(
                    f"FPN convs disagree on channel count ({fpn_ch} vs "
                    f"{out_ch} at {theirs}) — fix name_map"
                )
            fpn_ch = out_ch
    for ours, theirs in name_map.items():
        wk = f"{prefix}{theirs}.weight"
        if wk not in sd:
            continue
        kernel = conv_kernel(sd[wk])  # (kH, kW, I, O)
        want = _FPN_SHAPES.get(ours)
        if want is not None:
            in_ch = want[0] if want[0] is not None else fpn_ch
            if kernel.shape != (want[1], want[1], in_ch, fpn_ch):
                raise ValueError(
                    f"FPN map {theirs}→{ours}: kernel {kernel.shape} does not "
                    f"look like a {want[1]}×{want[1]} ({in_ch}→{fpn_ch}) conv"
                    " — fix name_map"
                )
        params[ours] = {"kernel": kernel}
        bk = f"{prefix}{theirs}.bias"
        if bk in sd:
            params[ours]["bias"] = _np(sd[bk])
    return params


# amdegroot/ssd.pytorch stores the VGG base as a flat nn.Sequential; these
# are the Conv2d indices in that list, in our layer order (SURVEY.md §2
# item 9: the reference loads vgg16_reducedfc.pth into exactly this).
_VGG_SEQ_INDICES = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
    31: "conv6", 33: "conv7",
}


def convert_vgg16_ssd(
    sd: Mapping[str, Tensor], prefix: str = "vgg."
) -> dict[str, Any]:
    """amdegroot-style SSD VGG base (``vgg16_reducedfc.pth`` layout /
    reference ``ssd_vgg.py`` weights) → ``SSDVGG16`` params subtree.

    Maps the flat ``vgg.<i>.weight/bias`` Sequential indices to our named
    convs (incl. the dilated fc6→conv6 and 1×1 fc7→conv7 rows 31/33),
    ``L2Norm.weight`` → l2norm/scale, and ``extras.<i>`` pairs →
    extra{1..4}_{1,2}. Layers absent from the dict are skipped (the
    pretrained file ships only the VGG base).
    """
    params: dict[str, Any] = {}
    for idx, name in _VGG_SEQ_INDICES.items():
        wk = f"{prefix}{idx}.weight"
        if wk not in sd:
            continue
        params[name] = {"kernel": conv_kernel(sd[wk])}
        bk = f"{prefix}{idx}.bias"
        if bk in sd:
            params[name]["bias"] = _np(sd[bk])
    for l2key in ("L2Norm.weight", "l2norm.weight", "L2Norm.scale"):
        if l2key in sd:
            params["l2norm"] = {"scale": _np(sd[l2key])}
            break
    # extras: flat list of 8 convs → extra{block}_{1,2}
    for i in range(8):
        wk = f"extras.{i}.weight"
        if wk not in sd:
            continue
        name = f"extra{i // 2 + 1}_{i % 2 + 1}"
        params[name] = {"kernel": conv_kernel(sd[wk])}
        bk = f"extras.{i}.bias"
        if bk in sd:
            params[name]["bias"] = _np(sd[bk])
    return params


def convert_lstm_direction(
    sd: Mapping[str, Tensor], layer: int = 0, reverse: bool = False, prefix: str = ""
) -> dict[str, np.ndarray]:
    """torch nn.LSTM direction weights → ``LSTMDirection`` params."""
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    w_ih = _np(sd[f"{prefix}weight_ih_{sfx}"]).transpose(1, 0)  # (E, 4H)
    w_hh = _np(sd[f"{prefix}weight_hh_{sfx}"]).transpose(1, 0)  # (H, 4H)
    bias = _np(sd[f"{prefix}bias_ih_{sfx}"]) + _np(sd[f"{prefix}bias_hh_{sfx}"])
    return {"w_ih": w_ih, "w_hh": w_hh, "bias": bias}


def convert_zsgnet_checkpoint(
    sd: Mapping[str, Tensor],
    *,
    backbone_prefix: str = "backbone.encoder.",
    fpn_prefix: str = "backbone.fpn.",
    fpn_name_map: Mapping[str, str] | None = None,
    lstm_prefix: str = "lstm.",
    embed_key: str = "embedding.weight",
    head_conv_prefixes: tuple[str, ...] = (),
    num_anchors: int = 9,
) -> dict[str, Any]:
    """Full reference-ZSGNet checkpoint → partial flax variables.

    The reference's module names carry [M] confidence (SURVEY.md
    provenance warning) — the prefixes are therefore arguments with
    best-guess defaults. Returns {"params": ..., "batch_stats": ...}
    containing every subtree that could be converted; merge into a fresh
    init with ``zsgnet_tpu.train.checkpoint.partial_load``.

    The final entry of ``head_conv_prefixes`` (the A·5-channel projection)
    is regrouped from the reference's per-anchor-interleaved channel order
    into our component-grouped layout via :func:`regroup_head_kernel`
    (``num_anchors`` anchors/cell). Full-model forward parity vs a torch
    ZSGNet is asserted in tests/test_convert_full.py.
    """
    out_params: dict[str, Any] = {}
    out_stats: dict[str, Any] = {}

    bb = {k[len(backbone_prefix):]: v for k, v in sd.items() if k.startswith(backbone_prefix)}
    if bb:
        p, s = convert_resnet50(bb)
        out_params["backbone"] = p
        out_stats["backbone"] = s

    fpn = convert_fpn(sd, prefix=fpn_prefix, name_map=fpn_name_map)
    if fpn:
        out_params["fpn"] = fpn

    if embed_key in sd:
        out_params.setdefault("query_enc", {})["embed"] = {
            "embedding": _np(sd[embed_key])
        }
    lstm_keys = [k for k in sd if k.startswith(lstm_prefix)]
    if lstm_keys:
        lstm_sd = {k[len(lstm_prefix):]: v for k, v in sd.items() if k in lstm_keys}
        qe = out_params.setdefault("query_enc", {})
        qe["fwd"] = convert_lstm_direction(lstm_sd, reverse=False)
        qe["bwd"] = convert_lstm_direction(lstm_sd, reverse=True)

    for i, cp in enumerate(head_conv_prefixes):
        w, b = sd.get(f"{cp}.weight"), sd.get(f"{cp}.bias")
        if w is None:
            continue
        head = out_params.setdefault("head", {})
        if i == 0:
            # First fusion conv: stored as flat params (the decomposed
            # evaluation in models.zsgnet.PredictionHead slices it).
            head["conv0_kernel"] = conv_kernel(w)
            if b is not None:
                head["conv0_bias"] = _np(b)
        elif i < len(head_conv_prefixes) - 1:
            head[f"conv{i}"] = {
                "kernel": conv_kernel(w),
                **({"bias": _np(b)} if b is not None else {}),
            }
        else:
            # Final projection: reference emits per-anchor-interleaved
            # channels; our PredictionHead expects component-grouped.
            k2, b2 = regroup_head_kernel(
                conv_kernel(w), _np(b) if b is not None else None, num_anchors
            )
            head["out"] = {"kernel": k2, **({"bias": b2} if b2 is not None else {})}

    return {"params": out_params, "batch_stats": out_stats}

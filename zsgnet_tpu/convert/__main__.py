"""Reference checkpoint → zsgnet_tpu checkpoint, as a user-facing CLI.

The migration path for a reference user (DESIGN.md roadmap #5): point this
at a trained ``zsgnet-pytorch`` ``.pth`` and get an Orbax checkpoint the
Learner/Grounder load directly:

    python -m zsgnet_tpu.convert <ref.pth> <out_dir> [--key=val ...]

Because the reference's exact module names carry [M] confidence
(SURVEY.md provenance warning), the CLI AUTO-DETECTS the five subtree
prefixes from the state-dict's own key structure (and prints what it
found); every prefix is also overridable (``--backbone_prefix=...`` etc).
Handles the reference trainer's save format (``torch.save`` dict with a
``model_state_dict``/``model`` entry, SURVEY.md §5 checkpoint row) and
DDP's ``module.`` wrapper.

Conversion correctness (kernel layouts, LSTM gate order, decomposed
conv0, per-anchor→component-grouped head regroup, FPN name map) is
asserted end-to-end in tests/test_convert_full.py.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path
from typing import Any, Mapping


def detect_layout(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Infer subtree prefixes from state-dict key structure.

    Returns dict with backbone_prefix, fpn_prefix, lstm_prefix, embed_key,
    head_conv_prefixes, num_anchors (None where not found).
    """
    keys = list(sd.keys())

    def find_prefix(marker: str) -> str | None:
        for k in keys:
            i = k.find(marker)
            if i >= 0:
                return k[:i]
        return None

    # ResNet-50 body: '<prefix>layer1.0.conv1.weight'
    backbone = find_prefix("layer1.0.conv1.weight")
    # torch LSTM: '<prefix>weight_ih_l0'
    lstm = find_prefix("weight_ih_l0")
    if lstm and lstm.endswith("lstm."):
        pass  # typical: 'lstm.weight_ih_l0'
    # Embedding: a 2-D (vocab, emb) weight whose name mentions emb
    embed_key = None
    for k in keys:
        if re.search(r"emb\w*\.weight$", k) and getattr(sd[k], "ndim", 0) == 2:
            embed_key = k
            break
    # FPN (kuangliu naming per convert.FPN_NAME_MAP): '<prefix>latlayer1.weight'
    fpn = find_prefix("latlayer1.weight")
    # Head: consecutive conv prefixes; final conv out_ch divisible by 5.
    head_prefixes: tuple[str, ...] = ()
    num_anchors = None
    conv_groups: dict[str, list[str]] = {}
    for k in keys:
        m = re.match(r"(.*\.)((?:conv\d+|out|att_reg_box))\.weight$", k)
        if m and getattr(sd[k], "ndim", 0) == 4:
            conv_groups.setdefault(m.group(1), []).append(m.group(2))
    for prefix, names in conv_groups.items():
        if backbone and prefix.startswith(backbone):
            continue
        out_name = "out" if "out" in names else ("att_reg_box" if "att_reg_box" in names else None)
        convs = sorted(n for n in names if n.startswith("conv"))
        if out_name and convs:
            oc = sd[f"{prefix}{out_name}.weight"].shape[0]
            if oc % 5 == 0:
                head_prefixes = tuple(f"{prefix}{n}" for n in convs) + (f"{prefix}{out_name}",)
                num_anchors = oc // 5
                break
    return {
        "backbone_prefix": backbone,
        "fpn_prefix": fpn,
        "lstm_prefix": lstm,
        "embed_key": embed_key,
        "head_conv_prefixes": head_prefixes,
        "num_anchors": num_anchors,
    }


def unwrap_state_dict(obj: Any) -> Mapping[str, Any]:
    """torch.save payload → flat state dict (reference saves a dict with
    model + optimizer entries; DDP prepends 'module.')."""
    sd = obj
    if isinstance(obj, dict) and not any(hasattr(v, "shape") for v in obj.values()):
        for key in ("model_state_dict", "model", "state_dict", "mdl"):
            if key in obj:
                sd = obj[key]
                break
    if hasattr(sd, "state_dict"):  # a whole nn.Module was saved
        sd = sd.state_dict()
    if any(k.startswith("module.") for k in sd):
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return sd


def main(argv: list[str] | None = None) -> dict[str, Any]:
    argv = sys.argv[1:] if argv is None else argv
    pos = [a for a in argv if not a.startswith("--")]
    overrides = dict(a[2:].split("=", 1) for a in argv if a.startswith("--") and "=" in a)
    if len(pos) != 2:
        raise SystemExit(__doc__)
    pth, out_dir = Path(pos[0]), Path(pos[1])

    import torch

    import jax
    import numpy as np

    from zsgnet_tpu.config import get_default_cfg
    from zsgnet_tpu.convert.torch_import import convert_zsgnet_checkpoint
    from zsgnet_tpu.models.zsgnet import get_default_net
    from zsgnet_tpu.train.checkpoint import CheckpointManager, partial_load

    obj = torch.load(pth, map_location="cpu", weights_only=False)
    sd = unwrap_state_dict(obj)

    layout = detect_layout(sd)
    for k in list(layout):
        if k in overrides:
            v = overrides.pop(k)
            layout[k] = tuple(v.split(",")) if k == "head_conv_prefixes" else (
                int(v) if k == "num_anchors" else v
            )
    print(f"detected layout: {json.dumps({k: v for k, v in layout.items()}, default=list)}")
    missing = [k for k, v in layout.items() if not v]
    if missing:
        print(f"WARNING: could not detect {missing}; those subtrees keep fresh init "
              f"(override with --<name>=...)")

    converted = convert_zsgnet_checkpoint(
        sd,
        backbone_prefix=layout["backbone_prefix"] or "\x00",
        fpn_prefix=layout["fpn_prefix"] or "\x00",
        lstm_prefix=layout["lstm_prefix"] or "\x00",
        embed_key=layout["embed_key"] or "\x00",
        head_conv_prefixes=layout["head_conv_prefixes"] or (),
        num_anchors=layout["num_anchors"] or 9,
    )

    # Fresh init at the matching sizes, then merge converted leaves in.
    # Detected embedding sizes are defaults; explicit --emb_dim/--vocab_size
    # overrides win (and must not collide as duplicate kwargs — ADVICE r2 #4).
    vocab_size = int(sd[layout["embed_key"]].shape[0]) if layout["embed_key"] else 10000
    emb_dim = int(sd[layout["embed_key"]].shape[1]) if layout["embed_key"] else 300
    vocab_size = int(overrides.pop("vocab_size", vocab_size))
    vocab_src = overrides.pop("vocab", None)  # optional: copy into the ckpt dir
    cfg_kw = {"compute_dtype": "float32", "do_dist": False, "emb_dim": emb_dim}
    cfg_kw.update(overrides)  # Config.replace coerces string values by field type
    cfg = get_default_cfg().replace(**cfg_kw)
    model = get_default_net(cfg, vocab_size=vocab_size)
    h, w = cfg.resize_img
    sample = {
        "img": np.zeros((1, h, w, 3), np.float32),
        "qvec": np.ones((1, cfg.max_qlen), np.int32),
        "qlens": np.full((1,), 2, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), sample
    )
    params = partial_load(variables["params"], converted.get("params", {}))
    stats = partial_load(
        variables.get("batch_stats", {}), converted.get("batch_stats", {})
    )

    # Conversion coverage report: which leaves came from the .pth.
    conv_flat = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    all_flat = [
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(
            {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
        )[0]
    ]
    converted_n = sum(
        1 for k in all_flat
        if k.replace("['params']", "", 1).replace("['batch_stats']", "", 1) in
        {c.replace("['params']", "", 1).replace("['batch_stats']", "", 1) for c in conv_flat}
    )

    mgr = CheckpointManager(out_dir)
    mgr.save(0, {"params": params, "batch_stats": stats, "best_metric": -1.0})
    mgr.wait()  # saves are host-async; make durable before the CLI exits
    # Self-contained output dir (VERDICT r2 #2): persist the cfg this
    # conversion inferred so Grounder/main --resume rebuild the same
    # architecture with no flags; --vocab=<path> copies the vocab beside it.
    (out_dir / "cfg.json").write_text(cfg.replace(vocab_size=vocab_size).dumps())
    if vocab_src:
        import shutil

        shutil.copy(vocab_src, out_dir / "vocab.json")
    report = {
        "leaves_total": len(all_flat),
        "leaves_converted": converted_n,
        "vocab_size": vocab_size,
        "out_dir": str(out_dir),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()

"""Inspect a checkpoint dir or exported artifact — ``python -m zsgnet_tpu.ckpt_info <dir>``.

Answers the operational questions a stranger has before resuming, serving,
or migrating a run: what architecture is this (cfg diff vs defaults), how
far did it train (epoch/step/best), how big is it (params by collection),
and what exactly would restore. Works on both artifact kinds:

  * Learner checkpoint dirs (Orbax steps + cfg.json/vocab.json sidecars —
    the self-contained layout, VERDICT r2 #2);
  * AOT serving artifacts (export.json + StableHLO modules, export.py).

The reference ships bare ``.pth`` files whose architecture lives in a
separate cfg.json the user must keep track of (SURVEY.md §5 checkpoint
row); here the dir answers for itself.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path


def _human(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TiB"


def _cfg_diff(cfg_dict: dict) -> dict:
    """Non-default config keys — the architecture/run fingerprint."""
    from zsgnet_tpu.config import Config

    defaults = {f.name: f.default for f in dataclasses.fields(Config)}
    diff = {}
    for k, v in cfg_dict.items():
        d = defaults.get(k, "<unknown>")
        vv = tuple(v) if isinstance(v, list) else v
        if vv != d:
            diff[k] = vv
    return diff


def _tree_stats(tree) -> tuple[int, int]:
    """(leaf count of elements, total bytes) without device transfer."""
    import jax
    import numpy as np

    n_elem, n_bytes = 0, 0
    for leaf in jax.tree.leaves(tree):
        size = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        n_elem += size
        n_bytes += size * getattr(leaf, "dtype", np.dtype("float32")).itemsize
    return n_elem, n_bytes


def describe_artifact(d: Path) -> dict:
    meta = json.loads((d / "export.json").read_text())
    modules = sorted(d.glob("*.stablehlo"))
    info = {
        "kind": "serving artifact (AOT StableHLO, zsgnet_tpu.export)",
        "version": meta.get("version"),
        "platforms": meta.get("platforms"),
        "buckets": meta.get("bucket_sizes") or [meta.get("batch_size")],
        "quantized": bool(meta.get("quantized")),
        "vocab_size": meta.get("cfg", {}).get("vocab_size"),
        "modules": {m.name: _human(m.stat().st_size) for m in modules},
        "cfg_non_default": _cfg_diff(meta.get("cfg", {})),
    }
    return info


def describe_checkpoint(d: Path) -> dict:
    from zsgnet_tpu.train.checkpoint import CheckpointManager, load_sidecar_cfg

    mgr = CheckpointManager(d)
    latest = mgr.latest_step()
    if latest is None:
        raise SystemExit(f"{d}: no Orbax steps found (and no export.json)")
    restored = mgr.restore(latest)
    p_elem, p_bytes = _tree_stats(restored.get("params", {}))
    s_elem, s_bytes = _tree_stats(restored.get("batch_stats", {}))
    o_elem, o_bytes = _tree_stats(restored.get("opt_state", {}))

    info = {
        "kind": "Learner checkpoint dir (Orbax + cfg/vocab sidecars)",
        "steps_on_disk": sorted(
            int(p.name) for p in d.iterdir() if p.is_dir() and p.name.isdigit()
        ),
        "latest_step": latest,
        "epoch": restored.get("epoch"),
        # >0: a mid-epoch preemption point (cfg.ckpt_every_steps /
        # graceful stop) — resume continues at this batch of `epoch`.
        "epoch_batches": restored.get("epoch_batches"),
        "best_metric": restored.get("best_metric"),
        "lr_scale": restored.get("lr_scale"),
        "plateau": {
            "best": restored.get("plateau_best"),
            "num_bad": restored.get("plateau_num_bad"),
        },
        "params": f"{p_elem / 1e6:.2f} M ({_human(p_bytes)})",
        "batch_stats": f"{s_elem / 1e6:.2f} M ({_human(s_bytes)})",
        "opt_state": f"{o_elem / 1e6:.2f} M ({_human(o_bytes)})",
        "restorable_total": _human(p_bytes + s_bytes + o_bytes),
    }
    ema = restored.get("ema_params")
    if ema:
        e_elem, e_bytes = _tree_stats(ema)
        # cfg.ema_decay > 0 run: Grounder/export serve these weights.
        info["ema_params"] = f"{e_elem / 1e6:.2f} M ({_human(e_bytes)}) — served"
    best_marker = d / "best_step.txt"
    if best_marker.exists():
        info["best_step"] = int(best_marker.read_text().strip())
    cfg = load_sidecar_cfg(d)
    if cfg is not None:
        info["cfg_non_default"] = _cfg_diff(json.loads(cfg.dumps()))
        info["self_contained"] = (d / "vocab.json").exists()
    else:
        info["self_contained"] = False
        info["warning"] = ("no cfg.json sidecar — pre-r3 checkpoint; resume "
                           "needs the original flags")
    return info


def describe(path: str | Path) -> dict:
    d = Path(path)
    if not d.exists():
        raise SystemExit(f"{d}: no such directory")
    if (d / "export.json").exists():
        return describe_artifact(d)
    return describe_checkpoint(d)


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        raise SystemExit(__doc__)
    print(json.dumps(describe(argv[0]), indent=2, default=str))


if __name__ == "__main__":
    main()

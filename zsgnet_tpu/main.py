"""CLI entry point — reference ``code/main_dist.py`` parity (SURVEY.md §2 #1).

Usage mirrors the reference:

    python -m zsgnet_tpu.main <uid> --ds_to_use=refclef --bs=16 --lr=1e-4
    python -m zsgnet_tpu.main <uid> --only_val=True --resume=True

Every ``--key=value`` flag is a Config override (reference key names and
aliases accepted — see ``zsgnet_tpu.config.KEY_MAPS``).

Multi-chip is automatic: there is no ``torch.distributed.launch``
equivalent to invoke — one process drives all local chips through the
jitted SPMD program. On multi-host pods, launch one process per host with
``--multi_host=True`` (calls ``jax.distributed.initialize``); batches are
host-sharded by process index, gradients psum over ICI/DCN inside the
compiled step.
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.train.learner import Learner


def list_flags() -> str:
    """Every ``--key=value`` override: name, default, reference aliases."""
    import dataclasses

    from zsgnet_tpu.config import KEY_MAPS, Config

    aliases: dict[str, list[str]] = {}
    for alias, key in KEY_MAPS.items():
        aliases.setdefault(key, []).append(alias)
    lines = ["Config overrides (--key=value; reference aliases in brackets):"]
    for f in dataclasses.fields(Config):
        al = f"  [{', '.join(sorted(aliases[f.name]))}]" if f.name in aliases else ""
        lines.append(f"  --{f.name}={f.default!r}{al}")
    return "\n".join(lines)


def parse_args(argv: list[str]) -> tuple[str, dict[str, str], bool]:
    if "--list_flags" in argv:
        raise SystemExit(list_flags())
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("uid", help="experiment id (logs/checkpoints key)")
    parser.add_argument("--multi_host", default="False")
    known, unknown = parser.parse_known_args(argv)
    overrides: dict[str, str] = {}
    for tok in unknown:
        if not tok.startswith("--") or "=" not in tok:
            raise SystemExit(f"flags must be --key=value, got: {tok}")
        k, v = tok[2:].split("=", 1)
        overrides[k] = v
    return known.uid, overrides, known.multi_host.lower() in ("1", "true")


def main_dist(uid: str, **kwargs) -> dict[str, float]:
    """Programmatic entry (reference ``main_dist(uid, **kwargs)``).

    On ``--resume=True`` the checkpoint dir's ``cfg.json`` sidecar (if
    present) becomes the config BASE — the trained architecture restores
    without re-passing flags — and the call's explicit kwargs override it
    (VERDICT r2 #2).

    ``--cfg_file=<path>`` loads a preset JSON as the config base instead
    of ``configs/cfg.json`` (explicit kwargs still override). Shipped
    presets live under ``configs/`` — e.g. ``flickr30k_grouped.json``,
    the grouped multi-query recipe for the paper's lead dataset
    (queries_per_img=5: one backbone pass per image ≈ 3x training
    throughput, chip-measured in BASELINE.md).
    """
    from pathlib import Path

    cfg_file = kwargs.pop("cfg_file", None)
    cfg = get_default_cfg(cfg_file).replace(uid=uid, **kwargs)
    if cfg.resume:
        from zsgnet_tpu.train.checkpoint import load_sidecar_cfg

        ckpt_root = Path(cfg.resume_path) if cfg.resume_path else (
            Path(cfg.tmp_path) / "models" / uid
        )
        saved_cfg = load_sidecar_cfg(ckpt_root)
        if saved_cfg is not None:
            cfg = saved_cfg.replace(uid=uid, **kwargs)
            if jax.process_index() == 0:
                print(f"resume: config base loaded from {ckpt_root / 'cfg.json'}")
    np.random.seed(cfg.seed)

    shard_id, num_shards = jax.process_index(), jax.process_count()
    data = get_data(cfg, shard_id=shard_id, num_shards=num_shards)
    learn = Learner(uid, data, cfg)

    if cfg.only_val:
        metrics = learn.validate()
    elif cfg.only_test:
        metrics = learn.testing()
    else:
        if jax.process_count() == 1:
            # Graceful preemption (single-host; see Learner.request_stop
            # for why multi-host relies on ckpt_every_steps instead):
            # SIGTERM checkpoints the exact position and exits resumable.
            import signal

            try:
                signal.signal(
                    signal.SIGTERM, lambda *_: learn.request_stop()
                )
            except ValueError:
                pass  # not the main thread (embedded use) — skip
        learn.fit(cfg.epochs, cfg.lr)
        metrics = learn.validate()
    if jax.process_index() == 0:
        print({k: round(v, 4) for k, v in metrics.items()})
    return metrics


def main() -> None:
    uid, overrides, multi_host = parse_args(sys.argv[1:])
    if multi_host:
        jax.distributed.initialize()
    main_dist(uid, **overrides)


if __name__ == "__main__":
    main()

"""Checkpointing — Orbax-backed, reference save/load semantics.

Capability parity with the reference's ``save_model_dict`` /
``load_model_dict`` (SURVEY.md §5 "Checkpoint / resume"): persists
{params, batch_stats, opt_state, step, epoch, best_metric}, supports
strict and partial (warm-start) restore, best-by-val-metric policy is the
Learner's job.

Saves are ASYNC on the host side: ``save()`` returns once the arrays are
fetched device→host (orbax does this synchronously — the part donation
safety requires), while serialization + atomic directory commit proceed
on orbax's background thread, overlapped with the next training epoch.
``restore``/``latest_step`` barrier on in-flight saves first.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str | Path, max_to_keep: int = 3):
        self.dir = Path(ckpt_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
            # Registering the handler up front lets item_metadata() work on
            # a FRESH manager instance (otherwise it returns None until a
            # save/restore with args teaches the registry) — the adaptive
            # template in restore() depends on it.
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, step: int, payload: dict[str, Any]) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        """Barrier for in-flight async saves (call before process exit)."""
        self.mngr.wait_until_finished()

    def latest_step(self) -> int | None:
        self.mngr.wait_until_finished()
        return self.mngr.latest_step()

    def top_level_keys(self, step: int | None = None) -> list[str] | None:
        """Top-level payload keys of a checkpoint, or None if unreadable.

        Lets callers adapt restore templates to OPTIONAL array subtrees
        (e.g. ``ema_params``: present only when the saving run had
        ``cfg.ema_decay > 0``) — scalars are handled by
        :meth:`_adapt_template`, but array subtrees must match exactly."""
        self.mngr.wait_until_finished()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        try:
            return list(self.mngr.item_metadata(step).keys())
        except Exception:
            return None

    def restore(self, step: int | None = None, template: dict[str, Any] | None = None) -> dict[str, Any]:
        self.mngr.wait_until_finished()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        if template is not None:
            return self.mngr.restore(
                step, args=ocp.args.StandardRestore(self._adapt_template(step, template))
            )
        return self.mngr.restore(step)

    def _adapt_template(self, step: int, template: dict[str, Any]) -> dict[str, Any]:
        """Fit the restore template to the on-disk TOP-LEVEL key set.

        Orbax StandardRestore demands an exact tree match; the payload's
        scalar bookkeeping keys evolve across framework versions (e.g.
        ``plateau_best`` added in r3). Array subtrees stay strict (an
        architecture mismatch must still fail loudly); scalar keys are
        intersected, and scalars on disk that the template lacks get a
        dtype-default so they restore too (readable via ``.get``).
        """
        try:
            meta = self.mngr.item_metadata(step)
            disk_keys = list(meta.keys())
        except Exception:
            return template
        import numpy as np

        out: dict[str, Any] = {}
        for k in disk_keys:
            if k in template:
                out[k] = template[k]
            else:
                md = meta.tree[k] if hasattr(meta, "tree") else None
                dtype = getattr(md, "dtype", None)
                shape = getattr(md, "shape", None)
                if shape in ((), None):
                    out[k] = (
                        0 if dtype is not None and np.issubdtype(dtype, np.integer) else 0.0
                    )
                else:  # unknown array subtree — let orbax report the mismatch
                    return template
        return out


def find_sidecar(ckpt_dir: str | Path, name: str) -> Path | None:
    """Locate a checkpoint sidecar file (``cfg.json`` / ``vocab.json``).

    Sidecars live at the model-dir top level; a checkpoint path may point
    at the dir itself OR its ``best/`` subdir (the single-slot
    best-by-val-Acc store), so the parent is checked too.
    """
    ckpt_dir = Path(ckpt_dir)
    for d in (ckpt_dir, ckpt_dir.parent):
        p = d / name
        if p.exists():
            return p
    return None


def load_sidecar_cfg(ckpt_dir: str | Path):
    """Restore the ``Config`` persisted beside a checkpoint, or None.

    Makes checkpoints self-contained (VERDICT r2 #2; reference ships
    ``.pth`` + cfg.json together — SURVEY.md §5 checkpoint row): a model
    trained with non-default architecture flags (``head_ch``, ``fpn_ch``,
    ``resize_img``…) can be served/resumed from the bare directory with
    no flags reconstructed by hand.
    """
    from zsgnet_tpu.config import Config

    p = find_sidecar(ckpt_dir, "cfg.json")
    if p is None:
        return None
    import json

    return Config().replace(**json.loads(p.read_text()))


def partial_load(params: Any, loaded: Any) -> Any:
    """Warm-start merge: take loaded leaves where the tree paths+shapes
    match, keep fresh init elsewhere (reference's non-strict load)."""
    flat_l = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }

    def merge(path, leaf):
        key = jax.tree_util.keystr(path)
        cand = flat_l.get(key)
        if cand is not None and getattr(cand, "shape", None) == leaf.shape:
            return cand
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)

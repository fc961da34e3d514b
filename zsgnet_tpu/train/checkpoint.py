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
        )

    def save(self, step: int, payload: dict[str, Any]) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        """Barrier for in-flight async saves (call before process exit)."""
        self.mngr.wait_until_finished()

    def latest_step(self) -> int | None:
        self.mngr.wait_until_finished()
        return self.mngr.latest_step()

    def restore(self, step: int | None = None, template: dict[str, Any] | None = None) -> dict[str, Any]:
        self.mngr.wait_until_finished()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        if template is not None:
            return self.mngr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.mngr.restore(step)


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

"""Device mesh construction — the TPU replacement for DDP process groups.

The reference's only parallelism is NCCL DistributedDataParallel
(SURVEY.md §2 item 11). TPU-native equivalent: a 1-D ``data`` mesh over
all chips; gradients are psum-med over ICI inside one jitted program
(XLA schedules the collectives), and ``jax.process_index() == 0``
replaces ``is_main_process()`` for logging/checkpoint guards.

``make_mesh`` is host-count agnostic: under a multi-host runtime
(``jax.distributed.initialize`` already called by the launcher) it uses
all global devices; on one host it uses the local ones.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zsgnet_tpu.config import Config


def make_mesh(cfg: Config, devices: list | None = None) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    shape = cfg.mesh_shape
    if len(shape) != 1:
        raise ValueError("zsgnet uses a 1-D data mesh (the model fits one chip)")
    n = shape[0] if shape[0] != -1 else devs.size
    return Mesh(devs[:n].reshape(n), axis_names=(cfg.data_axis,))


def batch_sharding(mesh: Mesh, cfg: Config) -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    """Reference ``is_main_process()`` equivalent for logging/checkpoints."""
    return jax.process_index() == 0

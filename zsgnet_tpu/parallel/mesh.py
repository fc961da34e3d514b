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
    """Data mesh over all (or the given) devices.

    ``cfg.mesh_spatial > 1`` adds a second axis: the mesh becomes
    ``(data, spatial)`` and the train/eval steps switch from shard_map
    data parallelism to GSPMD auto-partitioning with the image height
    sharded over the spatial axis (see ``parallel.train_step``).
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    shape = cfg.mesh_shape
    if len(shape) != 1:
        raise ValueError("zsgnet uses a 1-D data mesh (the model fits one chip)")
    sp = max(int(cfg.mesh_spatial), 1)
    if sp > 1:
        if shape[0] == -1 and devs.size % sp:
            # -1 means ALL devices (1-D semantics) — silently stranding
            # devs.size % sp chips would idle hardware, and on multi-host
            # a process whose devices fell off the mesh hangs collectives.
            raise ValueError(
                f"mesh_spatial={sp} does not divide the {devs.size} devices; "
                "pick a divisor or set mesh_shape=(n,) explicitly"
            )
        n = shape[0] if shape[0] != -1 else devs.size // sp
        if n < 1 or n * sp > devs.size:
            raise ValueError(
                f"mesh (data={n}, spatial={sp}) needs {max(n, 1) * sp} devices, "
                f"have {devs.size}"
            )
        return Mesh(
            devs[: n * sp].reshape(n, sp),
            axis_names=(cfg.data_axis, cfg.spatial_axis),
        )
    n = shape[0] if shape[0] != -1 else devs.size
    return Mesh(devs[:n].reshape(n), axis_names=(cfg.data_axis,))


def is_spatial_mesh(mesh: Mesh | None, cfg: Config) -> bool:
    """True when `mesh` carries the spatial axis (GSPMD-partitioned steps)."""
    return mesh is not None and cfg.spatial_axis in mesh.axis_names


def batch_sharding(mesh: Mesh, cfg: Config) -> NamedSharding:
    """Leading-axis (batch) sharding for input pytrees."""
    return NamedSharding(mesh, P(cfg.data_axis))


def batch_shardings(
    mesh: Mesh, cfg: Config, keys=None
) -> dict[str, NamedSharding]:
    """Per-key input shardings for the device batch.

    On a spatial mesh the image is additionally sharded on its height
    (dim 1 of NHWC) so GSPMD partitions every conv spatially; every
    other key (qvec/qlens/annot, plus the optional ``pair_valid`` /
    ``valid`` masks) shards on batch only. ``keys`` selects which keys
    the dict covers (default: the four core device-batch keys) — jit
    ``in_shardings`` dicts must match the batch pytree structure exactly.
    """
    data = NamedSharding(mesh, P(cfg.data_axis))
    img = (
        NamedSharding(mesh, P(cfg.data_axis, cfg.spatial_axis))
        if is_spatial_mesh(mesh, cfg)
        else data
    )
    if keys is None:
        keys = ("img", "qvec", "qlens", "annot")
    return {k: (img if k == "img" else data) for k in keys}


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    """Reference ``is_main_process()`` equivalent for logging/checkpoints."""
    return jax.process_index() == 0

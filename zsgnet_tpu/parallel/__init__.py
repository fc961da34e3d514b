"""SPMD parallelism: device mesh, sharded train/eval steps, collectives."""

from zsgnet_tpu.parallel.mesh import make_mesh  # noqa: F401
from zsgnet_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

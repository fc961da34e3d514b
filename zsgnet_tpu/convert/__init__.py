"""Weight conversion from PyTorch reference checkpoints to flax params."""

from zsgnet_tpu.convert.torch_import import (  # noqa: F401
    convert_lstm_direction,
    convert_resnet50,
    convert_zsgnet_checkpoint,
)

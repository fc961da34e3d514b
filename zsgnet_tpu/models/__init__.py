"""Flax model zoo: ResNet-50+FPN (retina), SSD-VGG16, BiLSTM, ZSGNet."""

from zsgnet_tpu.models.zsgnet import ZSGNet, get_default_net  # noqa: F401

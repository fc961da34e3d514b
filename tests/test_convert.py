"""torch→flax conversion parity: flax forward must equal torch forward.

Rebuilds the torchvision ResNet-50 architecture in pure torch (torchvision
itself is not installed), converts random weights, and compares outputs —
this pins conv padding, stride placement, and BN semantics exactly
(SURVEY.md §7 "hard parts": ResNet-50 conversion fidelity).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zsgnet_tpu.convert.torch_import import (  # noqa: E402
    convert_lstm_direction,
    convert_resnet50,
)
from zsgnet_tpu.models.resnet import ResNet50  # noqa: E402


class TorchBottleneck(tnn.Module):
    """torchvision Bottleneck v1.5 (stride on the 3×3)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, stride=1)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


@pytest.mark.slow
def test_resnet50_conversion_parity(rng):
    tm = TorchResNet50().eval()
    # Randomize BN stats so parity isn't trivially mean-0/var-1.
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)

    params, stats = convert_resnet50(tm.state_dict())
    fm = ResNet50(dtype=jnp.float32)

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(torch.tensor(x.transpose(0, 3, 1, 2)))]
    got = fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, atol=2e-4, rtol=1e-3
        )


def test_bottleneck_conversion_shapes():
    tm = TorchResNet50()
    params, stats = convert_resnet50(tm.state_dict())
    # Spot-check kernel layouts.
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert params["layer1_0"]["conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert params["layer4_0"]["downsample_conv"]["kernel"].shape == (1, 1, 1024, 2048)
    assert stats["layer1_0"]["bn3"]["mean"].shape == (256,)


def test_lstm_conversion_parity(rng):
    from zsgnet_tpu.models.bilstm import LSTMDirection

    E, H, B, T = 5, 7, 3, 4
    tl = tnn.LSTM(E, H, bidirectional=True, batch_first=True)
    x = rng.normal(size=(B, T, E)).astype(np.float32)
    lengths = np.array([4, 2, 3], dtype=np.int32)
    packed = tnn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        _, (h_n, _) = tl(packed)
    want_f, want_b = h_n[0].numpy(), h_n[1].numpy()

    sd = tl.state_dict()
    pf = convert_lstm_direction(sd, reverse=False)
    pb = convert_lstm_direction(sd, reverse=True)
    xj, lj = jnp.asarray(x), jnp.asarray(lengths)
    _, hf = LSTMDirection(H, reverse=False).apply({"params": jax.tree.map(jnp.asarray, pf)}, xj, lj)
    _, hb = LSTMDirection(H, reverse=True).apply({"params": jax.tree.map(jnp.asarray, pb)}, xj, lj)
    np.testing.assert_allclose(np.asarray(hf), want_f, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb), want_b, atol=1e-5)

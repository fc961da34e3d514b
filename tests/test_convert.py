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


def test_vgg16_ssd_conversion_shapes(rng):
    """Synthetic amdegroot-layout state_dict → our SSDVGG16 param names,
    verified against a real flax init (shapes must line up exactly)."""
    from zsgnet_tpu.convert.torch_import import _VGG_SEQ_INDICES, convert_vgg16_ssd
    from zsgnet_tpu.models.ssd_vgg import SSDVGG16

    # Build the torch-side dict with correct shapes.
    cfgs = {  # out_ch per conv, following VGG16 'D' + SSD mods
        "conv1_1": (64, 3), "conv1_2": (64, 64),
        "conv2_1": (128, 64), "conv2_2": (128, 128),
        "conv3_1": (256, 128), "conv3_2": (256, 256), "conv3_3": (256, 256),
        "conv4_1": (512, 256), "conv4_2": (512, 512), "conv4_3": (512, 512),
        "conv5_1": (512, 512), "conv5_2": (512, 512), "conv5_3": (512, 512),
        "conv6": (1024, 512), "conv7": (1024, 1024),
    }
    sd = {}
    for idx, name in _VGG_SEQ_INDICES.items():
        o, i = cfgs[name]
        k = 1 if name == "conv7" else 3
        sd[f"vgg.{idx}.weight"] = torch.randn(o, i, k, k)
        sd[f"vgg.{idx}.bias"] = torch.randn(o)
    sd["L2Norm.weight"] = torch.randn(512)
    extras = [(256, 1024, 1), (512, 256, 3), (128, 512, 1), (256, 128, 3),
              (128, 256, 1), (256, 128, 3), (128, 256, 1), (256, 128, 3)]
    for i, (o, ic, k) in enumerate(extras):
        sd[f"extras.{i}.weight"] = torch.randn(o, ic, k, k)
        sd[f"extras.{i}.bias"] = torch.randn(o)

    params = convert_vgg16_ssd(sd)

    model = SSDVGG16(out_ch=32, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 96, 96, 3)).astype(np.float32))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    for name, sub in params.items():
        assert name in ref, f"converted name {name} not in model params"
        for leaf, v in sub.items():
            assert ref[name][leaf].shape == v.shape, (
                f"{name}/{leaf}: model {ref[name][leaf].shape} vs converted {v.shape}"
            )
    # Every model conv except the proj layers must be covered.
    uncovered = {k for k in ref if k not in params and not k.startswith("proj")}
    assert not uncovered, f"unconverted model params: {uncovered}"

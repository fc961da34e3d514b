"""SSD-VGG16 backbone conversion parity vs a torch amdegroot-layout oracle.

Covers the full reference SSD feature extractor — VGG base (ceil-mode
pool3, 3×3/1 pool5, dilated fc6→conv6, 1×1 fc7→conv7), L2Norm on conv4_3,
and the extras tower — converted via ``convert_vgg16_ssd`` and compared
map-by-map at the canonical 300² input (VERDICT r1 #7; SURVEY.md §2
item 9).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from zsgnet_tpu.convert.torch_import import convert_vgg16_ssd  # noqa: E402
from zsgnet_tpu.models.ssd_vgg import SSDVGG16, ssd_feature_map_sizes  # noqa: E402


class TorchL2Norm(tnn.Module):
    def __init__(self, ch=512, scale=20.0):
        super().__init__()
        self.weight = tnn.Parameter(torch.full((ch,), scale))

    def forward(self, x):
        norm = x.pow(2).sum(dim=1, keepdim=True).add(1e-10).sqrt()
        return self.weight[None, :, None, None] * x / norm


class TorchSSDVGG(tnn.Module):
    """amdegroot/ssd.pytorch feature extractor: ``vgg`` Sequential with
    the exact conv indices of ``vgg16_reducedfc.pth`` + L2Norm + extras."""

    def __init__(self):
        super().__init__()
        c = lambda i, o, **kw: tnn.Conv2d(i, o, 3, padding=1, **kw)  # noqa: E731
        mp = lambda **kw: tnn.MaxPool2d(2, 2, **kw)  # noqa: E731
        relu = tnn.ReLU(inplace=False)
        self.vgg = tnn.ModuleList([
            c(3, 64), relu, c(64, 64), relu, mp(),                    # 0..4
            c(64, 128), relu, c(128, 128), relu, mp(),                # 5..9
            c(128, 256), relu, c(256, 256), relu, c(256, 256), relu,  # 10..15
            mp(ceil_mode=True),                                       # 16
            c(256, 512), relu, c(512, 512), relu, c(512, 512), relu,  # 17..22
            mp(),                                                     # 23
            c(512, 512), relu, c(512, 512), relu, c(512, 512), relu,  # 24..29
            tnn.MaxPool2d(3, 1, 1),                                   # 30
            tnn.Conv2d(512, 1024, 3, padding=6, dilation=6), relu,    # 31..32
            tnn.Conv2d(1024, 1024, 1), relu,                          # 33..34
        ])
        self.L2Norm = TorchL2Norm()
        self.extras = tnn.ModuleList([
            tnn.Conv2d(1024, 256, 1),
            tnn.Conv2d(256, 512, 3, stride=2, padding=1),
            tnn.Conv2d(512, 128, 1),
            tnn.Conv2d(128, 256, 3, stride=2, padding=1),
            tnn.Conv2d(256, 128, 1),
            tnn.Conv2d(128, 256, 3),
            tnn.Conv2d(256, 128, 1),
            tnn.Conv2d(128, 256, 3),
        ])

    def forward(self, x):
        sources = []
        for i in range(23):
            x = self.vgg[i](x)
        sources.append(self.L2Norm(x))  # conv4_3
        for i in range(23, len(self.vgg)):
            x = self.vgg[i](x)
        sources.append(x)  # conv7
        for i, layer in enumerate(self.extras):
            x = F.relu(layer(x))
            if i % 2 == 1:
                sources.append(x)
        return sources


@pytest.mark.slow
def test_ssd_backbone_conversion_parity_300(rng):
    tm = TorchSSDVGG().eval()
    params = convert_vgg16_ssd(tm.state_dict())
    x = rng.normal(size=(1, 300, 300, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    got = SSDVGG16(uniform_proj=False, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(x)
    )
    sizes = ssd_feature_map_sizes((300, 300))
    assert sizes == ((38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1))
    want_ch = (512, 1024, 512, 256, 256, 256)
    assert len(got) == len(want) == 6
    for lvl, (g, w, hw, ch) in enumerate(zip(got, want, sizes, want_ch)):
        assert g.shape == (1, hw[0], hw[1], ch), f"level {lvl}: {g.shape}"
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
            atol=5e-4, rtol=2e-3, err_msg=f"level {lvl}",
        )


def test_ssd_ref_head_interface(rng):
    """ssd_uniform_proj=False (default): native per-scale channels, one
    head per scale; True: projected channels, shared head."""
    import jax

    from zsgnet_tpu.config import Config
    from zsgnet_tpu.models.zsgnet import ZSGNet

    def batch(cfg):
        h, w = cfg.resize_img
        return {
            "img": jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32)),
            "qvec": jnp.asarray(rng.integers(1, 20, size=(1, 6)).astype(np.int32)),
            "qlens": jnp.asarray(np.array([4], np.int32)),
        }

    base = dict(
        mdl_to_use="ssd_vgg", resize_img=(96, 96), lstm_dim=8, emb_dim=8,
        max_qlen=6, fpn_ch=16, head_ch=16, compute_dtype="float32",
        use_pallas=False,
    )
    cfg = Config(**base)  # ssd_uniform_proj defaults to False
    model = ZSGNet(cfg=cfg, vocab_size=20)
    v = model.init(jax.random.PRNGKey(0), batch(cfg))
    names = set(v["params"].keys())
    assert {"head0", "head1", "head2", "head3", "head4", "head5"} <= names
    assert "head" not in names
    # First-conv input channels follow the native source channels.
    k0 = v["params"]["head0"]["conv0_kernel"]
    k1 = v["params"]["head1"]["conv0_kernel"]
    assert k0.shape[2] == 512 + cfg.lang_dim + 2
    assert k1.shape[2] == 1024 + cfg.lang_dim + 2
    out = model.apply(v, batch(cfg))
    assert np.isfinite(np.asarray(out["att_out"])).all()

    cfg_u = Config(**base, ssd_uniform_proj=True)
    model_u = ZSGNet(cfg=cfg_u, vocab_size=20)
    v_u = model_u.init(jax.random.PRNGKey(0), batch(cfg_u))
    assert "head" in v_u["params"]
    assert v_u["params"]["head"]["conv0_kernel"].shape[2] == 16 + cfg_u.lang_dim + 2

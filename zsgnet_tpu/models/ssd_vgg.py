"""SSD-VGG16 backbone — flax, NHWC, the reference's second backbone mode.

Capability parity with the reference's ``code/ssd_vgg.py`` (SURVEY.md §2
item 9, derived from the amdegroot/ssd.pytorch lineage): a VGG-16 feature
extractor with the SSD modifications (conv5 3×3/1 maxpool, dilated fc6 →
conv6, 1×1 fc7 → conv7) plus the "extras" tower, producing 6 source maps.
For input 300²: 38²·512 (conv4_3, L2Norm-scaled), 19²·1024 (conv7),
10²·512, 5²·256, 3²·256, 1²·256.

TPU-first notes: NHWC; the L2Norm layer (channelwise L2 normalize with a
learned per-channel scale, init 20.0 — SSD's conv4_3 trick) is a pure VPU
op; dilation uses ``kernel_dilation`` which XLA lowers natively.

Head interface: by default (``uniform_proj=False``) the 6 source maps are
returned with their NATIVE channel counts (512/1024/512/256/256/256) —
the reference's head interface, so reference SSD checkpoints convert 1:1
(heads are then per-scale; see models/zsgnet.py). ``uniform_proj=True``
adds 1×1 projections to ``out_ch`` so the shared-head ``use_same_atb``
path compiles as one conv pipeline — faster on TPU but checkpoint-
incompatible with the reference SSD head (cfg.ssd_uniform_proj).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

# VGG-16 cfg 'D' conv plan up to conv5_3, 'M' = maxpool (SSD variant:
# pool3 uses ceil_mode, pool5 is 3×3/1).
_VGG_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "MC", 512, 512, 512, "M", 512, 512, 512)


def ssd_feature_map_sizes(img_size: Sequence[int]) -> tuple[tuple[int, int], ...]:
    """Source-map sizes for the SSD tower (input 300² → 38,19,10,5,3,1)."""
    h, w = int(img_size[0]), int(img_size[1])

    def conv_out(n: int, k: int, s: int, p: int, d: int = 1) -> int:
        return (n + 2 * p - d * (k - 1) - 1) // s + 1

    # three 2×2/2 pools (pool3 ceil), conv4_3 tap:
    h1, w1 = h // 2, w // 2
    h2, w2 = h1 // 2, w1 // 2
    h3, w3 = math.ceil(h2 / 2), math.ceil(w2 / 2)
    s1 = (h3, w3)  # conv4_3: 38 for 300
    h4, w4 = h3 // 2, w3 // 2  # pool4 → conv5 (19)
    s2 = (h4, w4)  # conv7 keeps 19 (pool5 is 3×3/1/pad1, fc6 dilated pad6)
    h5, w5 = conv_out(h4, 3, 2, 1), conv_out(w4, 3, 2, 1)
    s3 = (h5, w5)  # extras block1: 10
    h6, w6 = conv_out(h5, 3, 2, 1), conv_out(w5, 3, 2, 1)
    s4 = (h6, w6)  # extras block2: 5
    # Last two blocks: VALID 3×3 at canonical (300²) sizes; for smaller
    # inputs where the map is below the kernel size, pad=1 keeps the map
    # alive (matches SSDVGG16's adaptive padding).
    p5h, p5w = (1 if h6 < 3 else 0), (1 if w6 < 3 else 0)
    h7, w7 = conv_out(h6, 3, 1, p5h), conv_out(w6, 3, 1, p5w)
    s5 = (h7, w7)  # 3
    p6h, p6w = (1 if h7 < 3 else 0), (1 if w7 < 3 else 0)
    h8, w8 = conv_out(h7, 3, 1, p6h), conv_out(w7, 3, 1, p6w)
    s6 = (h8, w8)  # 1
    return (s1, s2, s3, s4, s5, s6)


class L2Norm(nn.Module):
    """Channelwise L2 normalization with learned scale (SSD conv4_3)."""

    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (x.shape[-1],),
        )
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-10)
        return (x32 / norm * scale).astype(x.dtype)


class SSDVGG16(nn.Module):
    """Image → 6 source maps (native channels, or ``out_ch`` when
    ``uniform_proj``)."""

    out_ch: int = 256
    uniform_proj: bool = False
    dtype: Any = jnp.bfloat16
    quant_mode: str = "off"  # int8 serving; see models/quant.py

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> tuple[Array, ...]:
        del train  # no BN in VGG-SSD
        from zsgnet_tpu.models.quant import conv_for

        conv = lambda f, k, name, pad, dil=1, stride=1: conv_for(  # noqa: E731
            self.quant_mode, features=f, kernel_size=(k, k),
            strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)] if pad else "VALID",
            kernel_dilation=(dil, dil),
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        x = x.astype(self.dtype)
        sources = []
        ci = 0
        block, layer = 1, 1
        for item in _VGG_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                block += 1
                layer = 1
            elif item == "MC":  # ceil-mode pool (pad bottom/right if odd)
                ph = x.shape[1] % 2
                pw = x.shape[2] % 2
                if ph or pw:
                    x = jnp.pad(
                        x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-jnp.inf,
                    )
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                block += 1
                layer = 1
            else:
                x = nn.relu(conv(item, 3, f"conv{block}_{layer}", 1)(x))
                layer += 1
                ci += 1
                if block == 4 and layer == 4:  # after conv4_3
                    sources.append(L2Norm(name="l2norm")(x))
        # pool5: 3×3 stride 1 pad 1, then dilated conv6 + conv7.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(1, 1))
        x = nn.relu(conv(1024, 3, "conv6", 6, dil=6)(x))
        x = nn.relu(conv(1024, 1, "conv7", 0)(x))
        sources.append(x)
        # extras: alternating 1×1 squeeze + 3×3 (first two strided).
        x = nn.relu(conv(256, 1, "extra1_1", 0)(x))
        x = nn.relu(conv(512, 3, "extra1_2", 1, stride=2)(x))
        sources.append(x)
        x = nn.relu(conv(128, 1, "extra2_1", 0)(x))
        x = nn.relu(conv(256, 3, "extra2_2", 1, stride=2)(x))
        sources.append(x)
        x = nn.relu(conv(128, 1, "extra3_1", 0)(x))
        x = nn.relu(conv(256, 3, "extra3_2", 1 if x.shape[1] < 3 else 0)(x))
        sources.append(x)
        x = nn.relu(conv(128, 1, "extra4_1", 0)(x))
        x = nn.relu(conv(256, 3, "extra4_2", 1 if x.shape[1] < 3 else 0)(x))
        sources.append(x)
        if not self.uniform_proj:
            return tuple(sources)  # reference head interface (per-scale ch)
        # Uniform channels for the shared fusion head (perf option).
        return tuple(
            nn.Conv(
                self.out_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                name=f"proj{i}",
            )(s)
            for i, s in enumerate(sources)
        )

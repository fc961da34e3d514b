"""Feature Pyramid Network P3–P7 — the RetinaNet recipe, NHWC/XLA-native.

Capability parity with the reference's FPN over C3/C4/C5 (SURVEY.md §2
item 8): 1×1 laterals → 256 ch, nearest-neighbor top-down upsample + add,
3×3 smoothing; P6 = stride-2 3×3 conv on C5; P7 = ReLU + stride-2 3×3 on
P6. All convs bf16-compute/fp32-params.

Upsampling reproduces torch ``F.interpolate(mode='nearest')`` EXACTLY
(src index = floor(dst·in/out)) — at 300² the P5→P4 hop is 10→19, a
non-integer ratio where ``jax.image.resize`` picks different source
pixels (half-pixel centers) and silently breaks converted-checkpoint
parity (SURVEY.md §7 "hard parts"). The indices are compile-time
constants, so XLA lowers the take to static slices.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def upsample_nearest_torch(x: Array, out_hw: tuple[int, int]) -> Array:
    """NHWC nearest-neighbor resize with torch ``F.interpolate`` index
    semantics: ``src = floor(dst * in / out)`` per spatial axis."""
    h, w = x.shape[1], x.shape[2]
    th, tw = out_hw
    iy = np.floor(np.arange(th) * (h / th)).astype(np.int32)
    ix = np.floor(np.arange(tw) * (w / tw)).astype(np.int32)
    return jnp.take(jnp.take(x, jnp.asarray(iy), axis=1), jnp.asarray(ix), axis=2)


class FPN(nn.Module):
    """(C3, C4, C5) → (P3, P4, P5, P6, P7), all ``out_ch`` channels."""

    out_ch: int = 256
    dtype: Any = jnp.bfloat16
    quant_mode: str = "off"  # int8 serving; see models/quant.py

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> tuple[Array, ...]:
        from zsgnet_tpu.models.quant import conv_for

        c3, c4, c5 = feats
        conv = lambda f, k, s, name: conv_for(  # noqa: E731
            self.quant_mode, features=f, kernel_size=(k, k), strides=(s, s),
            padding="VALID" if k == 1 else [(1, 1), (1, 1)],
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        p5 = conv(self.out_ch, 1, 1, "lat5")(c5)
        p4 = conv(self.out_ch, 1, 1, "lat4")(c4)
        p3 = conv(self.out_ch, 1, 1, "lat3")(c3)

        def upsample_to(x: Array, target: Array) -> Array:
            return upsample_nearest_torch(x, (target.shape[1], target.shape[2]))

        p4 = p4 + upsample_to(p5, p4)
        p3 = p3 + upsample_to(p4, p3)
        p3 = conv(self.out_ch, 3, 1, "smooth3")(p3)
        p4 = conv(self.out_ch, 3, 1, "smooth4")(p4)
        p5 = conv(self.out_ch, 3, 1, "smooth5")(p5)
        p6 = conv(self.out_ch, 3, 2, "p6")(c5)
        p7 = conv(self.out_ch, 3, 2, "p7")(nn.relu(p6))
        return (p3, p4, p5, p6, p7)

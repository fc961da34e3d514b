"""Feature Pyramid Network P3–P7 — the RetinaNet recipe, NHWC/XLA-native.

Capability parity with the reference's FPN over C3/C4/C5 (SURVEY.md §2
item 8): 1×1 laterals → 256 ch, nearest-neighbor top-down upsample + add,
3×3 smoothing; P6 = stride-2 3×3 conv on C5; P7 = ReLU + stride-2 3×3 on
P6. Upsampling uses ``jax.image.resize`` with 'nearest' — a pure gather
XLA lowers efficiently; all convs bf16-compute/fp32-params.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class FPN(nn.Module):
    """(C3, C4, C5) → (P3, P4, P5, P6, P7), all ``out_ch`` channels."""

    out_ch: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> tuple[Array, ...]:
        c3, c4, c5 = feats
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s),
            padding="VALID" if k == 1 else [(1, 1), (1, 1)],
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        p5 = conv(self.out_ch, 1, 1, "lat5")(c5)
        p4 = conv(self.out_ch, 1, 1, "lat4")(c4)
        p3 = conv(self.out_ch, 1, 1, "lat3")(c3)

        def upsample_to(x: Array, target: Array) -> Array:
            b, h, w, c = target.shape
            return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")

        p4 = p4 + upsample_to(p5, p4)
        p3 = p3 + upsample_to(p4, p3)
        p3 = conv(self.out_ch, 3, 1, "smooth3")(p3)
        p4 = conv(self.out_ch, 3, 1, "smooth4")(p4)
        p5 = conv(self.out_ch, 3, 1, "smooth5")(p5)
        p6 = conv(self.out_ch, 3, 2, "p6")(c5)
        p7 = conv(self.out_ch, 3, 2, "p7")(nn.relu(p6))
        return (p3, p4, p5, p6, p7)

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
    def __call__(
        self,
        feats: Sequence[Array],
        spatial=None,
        shard_flags: Sequence[bool] | None = None,
    ) -> tuple[Array, ...]:
        """``spatial``/``shard_flags``: manual spatial partitioning
        (parallel/halo.py) — flags say which inputs are still
        height-sharded. Sharded 3x3 convs halo-exchange; a sharded↔
        resharded pair is harmonized by resharding the sharded side
        (batch-split, full height); the top-down nearest upsample needs
        NO halo when both sides are sharded (src row = floor(dst·in/out)
        never leaves the shard — integer local heights make the local
        index map identical to the global one). Every output is
        RESHARDED before return: the fusion head runs on (B/S,
        full-height) tensors, untouched math."""
        from zsgnet_tpu.models.quant import conv_for

        c3, c4, c5 = feats
        f3, f4, f5 = tuple(shard_flags) if shard_flags else (False, False, False)

        def conv(f, k, s, name, sharded=False):
            if k == 1:
                pad = "VALID"
            else:
                pad = [(0, 0) if sharded else (1, 1), (1, 1)]
            return conv_for(
                self.quant_mode, features=f, kernel_size=(k, k), strides=(s, s),
                padding=pad, dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        def conv3(x, name, stride, sharded):
            """3x3 conv, halo-exchanged when the input is sharded.
            Returns (y, still_sharded)."""
            if sharded:
                from zsgnet_tpu.parallel.halo import halo_plan

                plan = halo_plan(x.shape[1], 3, stride, 1)
                if plan is None:
                    x, sharded = spatial.reshard(x), False
                else:
                    return conv(self.out_ch, 3, stride, name, True)(
                        spatial.halo(x, *plan)
                    ), True
            return conv(self.out_ch, 3, stride, name)(x), sharded

        p5 = conv(self.out_ch, 1, 1, "lat5")(c5)
        p4 = conv(self.out_ch, 1, 1, "lat4")(c4)
        p3 = conv(self.out_ch, 1, 1, "lat3")(c3)

        def upsample_to(x: Array, target: Array) -> Array:
            return upsample_nearest_torch(x, (target.shape[1], target.shape[2]))

        if f4 and not f5:  # harmonize: p5 already batch-split
            p4, f4 = spatial.reshard(p4), False
        p4 = p4 + upsample_to(p5, p4)
        if f3 and not f4:
            p3, f3 = spatial.reshard(p3), False
        p3 = p3 + upsample_to(p4, p3)
        p3, f3 = conv3(p3, "smooth3", 1, f3)
        p4, f4 = conv3(p4, "smooth4", 1, f4)
        p5, fp5 = conv3(p5, "smooth5", 1, f5)
        p6, f6 = conv3(c5, "p6", 2, f5)  # from c5 — c5's flag, not p5's
        p7, f7 = conv3(nn.relu(p6), "p7", 2, f6)
        outs = (p3, p4, p5, p6, p7)
        if spatial is not None:
            outs = tuple(
                spatial.reshard(p) if f else p
                for p, f in zip(outs, (f3, f4, fp5, f6, f7))
            )
        return outs

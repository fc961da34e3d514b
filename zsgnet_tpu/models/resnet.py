"""ResNet-50 backbone — flax linen, NHWC, bf16-compute / fp32-params.

Capability parity with the reference's torchvision ``resnet50`` tap of
C3/C4/C5 (512/1024/2048 channels; SURVEY.md §2 item 8), built TPU-first:

  * NHWC layout (TPU conv native) instead of torch's NCHW;
  * bottleneck-v1.5 (stride in the 3×3) matching torchvision so the
    torch→flax weight converter (``zsgnet_tpu.convert``) is exact;
  * BatchNorm in inference uses running stats; training updates them via
    flax mutable collections — but the grounding task trains with frozen
    BN by default (small batches), matching common detection practice;
  * optional ``jax.checkpoint`` (remat) over stages to trade FLOPs for
    HBM when scaling batch size.

Padding note (SURVEY.md §7 "hard parts"): torch pads 3×3/stride-2 convs
with explicit pad=1, which differs from XLA's SAME for even inputs. We use
explicit ((1,1),(1,1))-style padding throughout to keep converted-weight
parity bit-comparable.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def make_batch_norm(variance_mode: str, **kw) -> nn.Module:
    """BatchNorm factory over cfg.bn_variance (param tree identical in
    all modes — checkpoints interchange)."""
    if variance_mode in ("shifted", "shifted16"):
        from zsgnet_tpu.models.norm import ShiftedBatchNorm

        if variance_mode == "shifted16":  # bf16 moment math, fp32 accumulation
            kw["moment_dtype"] = jnp.bfloat16
        return ShiftedBatchNorm(**kw)
    if variance_mode not in ("exact", "fast"):
        raise ValueError(f"unknown bn_variance: {variance_mode!r}")
    return nn.BatchNorm(use_fast_variance=(variance_mode == "fast"), **kw)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck v1.5: 1×1 → 3×3(stride) → 1×1 ×4."""

    features: int  # bottleneck width; output is 4*features
    stride: int = 1
    dtype: Any = jnp.bfloat16
    bn_axis: Any = None  # mesh axis (or tuple of axes) for sync-BN under shard_map
    bn_variance: str = "exact"  # "exact"|"fast"|"shifted"; see Config
    quant_mode: str = "off"     # int8 serving; see models/quant.py

    @nn.compact
    def __call__(self, x: Array, train: bool = False, spatial=None) -> Array:
        """``spatial`` (parallel.halo.SpatialCtx | None): when set, ``x``
        arrives height-sharded over the spatial mesh axis and the 3x3
        conv exchanges halo rows explicitly (the caller guarantees the
        local height divides the stride — see ResNet50)."""
        # "exact" = torch's E[(x-μ)²], NOT flax's default E[x²]-E[x]²: the
        # fast form's cancellation costs ~4-18% relative error in
        # training-mode BN *gradients* through a ResNet-50 (fp32!),
        # breaking trajectory parity vs the reference
        # (tests/test_convert_full.py::test_training_trajectory_parity).
        # "shifted" keeps those grads at one-pass cost (models/norm.py).
        norm = lambda name: make_batch_norm(  # noqa: E731
            self.bn_variance,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.bn_axis,
            name=name,
        )
        from zsgnet_tpu.models.quant import conv_for

        conv = lambda f, k, s, name, pad: conv_for(  # noqa: E731
            self.quant_mode, features=f, kernel_size=(k, k), strides=(s, s),
            padding=pad, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        residual = x
        y = conv(self.features, 1, 1, "conv1", "VALID")(x)
        y = nn.relu(norm("bn1")(y))
        if spatial is not None:
            from zsgnet_tpu.parallel.halo import halo_plan

            ht, hb = halo_plan(y.shape[1], 3, self.stride, 1)
            y = conv(self.features, 3, self.stride, "conv2",
                     [(0, 0), (1, 1)])(spatial.halo(y, ht, hb))
        else:
            y = conv(self.features, 3, self.stride, "conv2", [(1, 1), (1, 1)])(y)
        y = nn.relu(norm("bn2")(y))
        y = conv(self.features * 4, 1, 1, "conv3", "VALID")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = conv(self.features * 4, 1, self.stride, "downsample_conv", "VALID")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Returns (C3, C4, C5) feature maps — 512/1024/2048 ch, strides 8/16/32.

    Mirrors the reference's ``RetinaBackBone.encode_feats`` tap points
    (SURVEY.md §2 item 8). ``remat`` wraps each stage in jax.checkpoint.
    """

    dtype: Any = jnp.bfloat16
    remat: bool = False
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    bn_axis: Any = None
    bn_variance: str = "exact"
    quant_mode: str = "off"
    spd_stem: bool = False  # space-to-depth stem (exact reparam, see below)

    @nn.compact
    def __call__(self, x: Array, train: bool = False, spatial=None):
        """``spatial`` (parallel.halo.SpatialCtx | None): manual spatial
        partitioning — ``x`` arrives height-sharded over the spatial mesh
        axis; every height-crossing op halo-exchanges explicitly, and the
        moment a stage's height stops dividing the shard count the tensor
        is resharded (gather height / split batch — parallel/halo.py).
        With ``spatial`` set the return value is ``(feats, flags)`` where
        ``flags[i]`` says whether feats[i] is still height-sharded."""
        sharded = spatial is not None
        x = x.astype(self.dtype)
        if sharded and self.spd_stem:
            # SPD stem under spatial sharding: not worth a halo variant
            # (the stem is one conv) — fall back to batch-split mode.
            x = spatial.reshard(x)
            sharded = False
        # Stem: 7×7/2 (torch pad=3) + BN + ReLU + 3×3/2 maxpool (torch pad=1).
        if self.spd_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # Space-to-depth reparameterization (MLPerf-ResNet TPU trick):
            # conv7×7/s2/p3 on (H,W,3) ≡ conv4×4/s1/pad(2,1) on the 2×2
            # space-to-depth input (H/2,W/2,12), with the 7×7 kernel
            # zero-embedded at index m+1 of an 8×8 grid (m = 2q+c-1).
            # The PARAMETER stays the original (7,7,3,64) kernel —
            # checkpoints are interchangeable; the rearrangement is an
            # in-graph constant-cost reshape. Exactness tested in
            # tests/test_model.py::test_spd_stem_matches_conv7x7.
            k = self.param(
                "conv1_kernel",
                nn.initializers.lecun_normal(),
                (7, 7, 3, 64),
                jnp.float32,
            ).astype(self.dtype)
            k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
            kspd = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
            kspd = kspd.reshape(4, 4, 12, 64)
            b, h, w, c = x.shape
            xs = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            xs = xs.reshape(b, h // 2, w // 2, 4 * c)
            x = jax.lax.conv_general_dilated(
                xs, kspd, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype,
            )
        else:
            from zsgnet_tpu.models.quant import conv_for

            pad_h = (3, 3)
            if sharded:
                from zsgnet_tpu.parallel.halo import halo_plan

                plan = halo_plan(x.shape[1], 7, 2, 3)
                if plan is None:
                    x = spatial.reshard(x)
                    sharded = False
                else:
                    x = spatial.halo(x, *plan)
                    pad_h = (0, 0)
            x = conv_for(
                self.quant_mode, features=64, kernel_size=(7, 7), strides=(2, 2),
                padding=[pad_h, (3, 3)], use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
            )(x)
        x = make_batch_norm(
            self.bn_variance,  # see Bottleneck
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, axis_name=self.bn_axis,
            name="bn1",
        )(x)
        x = nn.relu(x)
        if sharded:
            from zsgnet_tpu.parallel.halo import halo_plan

            plan = halo_plan(x.shape[1], 3, 2, 1)
            if plan is None:
                x = spatial.reshard(x)
                sharded = False
        if sharded:
            # fill=-inf: the ring ends must carry the maxpool's true pad
            # value — a zero there ties with post-ReLU zero maxima and
            # mis-routes the pooling BACKWARD (see SpatialCtx.halo).
            x = spatial.halo(x, *plan, fill=-jnp.inf)
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
        else:
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        feats, flags = [], []
        widths = (64, 128, 256, 512)
        block_cls = Bottleneck
        if self.remat:
            # (2, 3): train flag and the SpatialCtx — both static
            # (SpatialCtx is a frozen hashable dataclass; parallel/halo.py).
            block_cls = nn.remat(Bottleneck, static_argnums=(2, 3))
        for stage_i, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block_i in range(n_blocks):
                stride = 2 if (block_i == 0 and stage_i > 0) else 1
                if sharded:
                    from zsgnet_tpu.parallel.halo import halo_plan

                    if halo_plan(x.shape[1], 3, stride, 1) is None:
                        x = spatial.reshard(x)
                        sharded = False
                x = block_cls(
                    features=width, stride=stride, dtype=self.dtype,
                    bn_axis=self.bn_axis,
                    bn_variance=self.bn_variance,
                    quant_mode=self.quant_mode,
                    name=f"layer{stage_i + 1}_{block_i}",
                )(x, train, spatial if sharded else None)
            if stage_i >= 1:  # C3, C4, C5
                feats.append(x)
                flags.append(sharded)
        if spatial is not None:
            return tuple(feats), tuple(flags)
        return tuple(feats)  # type: ignore[return-value]

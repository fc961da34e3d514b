"""Shifted one-pass BatchNorm — torch-parity gradients at fast-variance cost.

The dilemma (measured, BASELINE.md "Training-math parity"):

  * flax's default fast variance ``E[x²]−E[x]²`` reads the activation
    ONCE but its cancellation puts 4–18 % relative error into
    training-mode BN *gradients* through ResNet-50 (fp32);
  * the exact form ``E[(x−μ)²]`` is well-conditioned but needs a second
    pass over the activation (μ first), costing ~9 % of the train step.

This module implements the classic shifted-moments fix: with any constant
``c`` per channel,

    var = E[(x−c)²] − (E[x]−c)²

is *algebraically identical* to the exact variance (so the autodiff
gradient is the same function), computable in ONE pass, and numerically
well-conditioned whenever ``c ≈ μ``. We use ``c = stop_gradient(running
mean)`` — this framework always trains from converted pretrained
checkpoints, so the running mean tracks the batch mean from step 0 (and
keeps tracking it via the EMA update each step). Gradient agreement with
the exact form is asserted in tests/test_model.py::test_shifted_bn_*.

Selected via ``cfg.bn_variance = "shifted"``; parameter/collection
structure is identical to ``nn.BatchNorm`` (scale/bias params,
batch_stats mean/var), so checkpoints are interchangeable across all
three modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import module as flax_module

Array = jnp.ndarray


class ShiftedBatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` with one-pass shifted-moments batch variance.

    Supports the subset of BatchNorm config this framework uses:
    ``axis=-1`` feature axis, fp32 reductions, optional ``axis_name``
    sync over a mesh axis. Eval mode (running stats) is numerically
    equivalent to ``nn.BatchNorm`` but not bit-identical under bf16:
    this module normalizes in fp32 and casts once at the end, while
    ``nn.BatchNorm(dtype=bfloat16)`` computes in bf16 — a ≤1-ulp bf16
    difference in the last bits (exact under fp32 compute).
    """

    # "bfloat16" (cfg.bn_variance="shifted16"): elementwise moment math in
    # bf16 with fp32 ACCUMULATION — a round-3 experiment on the ~12% BN
    # loop-fusion slice, measured and REJECTED on both axes: 126.4 ms vs
    # the 125.9 fp32 baseline (XLA already reads the bf16 activation and
    # accumulates fp32, so there was no bandwidth to save), and full-model
    # grad rel-L2 vs exact is 1.28 (vs shifted's accepted 0.022) — bf16
    # rounding in the moments breaks the near-cancellation in the BN
    # backward. Kept as the reproducible negative result
    # (tools/check_bn_grads.py); do not use for training.
    moment_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool | None = None) -> Array:
        use_running_average = flax_module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        assert self.axis == -1, "ShiftedBatchNorm supports feature-last only"
        feature_shape = (x.shape[-1],)
        reduction_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), feature_shape
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            md = self.moment_dtype
            xm = x.astype(md)
            c = jax.lax.stop_gradient(ra_mean.value)
            # ONE pass over x: both moments share the read; XLA fuses them.
            mean = jnp.mean(xm, axis=reduction_axes, dtype=jnp.float32)
            sq = jnp.mean(
                jnp.square(xm - c.astype(md)), axis=reduction_axes, dtype=jnp.float32
            )
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                sq = jax.lax.pmean(sq, self.axis_name)
            var = sq - jnp.square(mean - c)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = x.astype(jnp.float32) - mean
        mul = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            mul = mul * self.param(
                "scale", self.scale_init, feature_shape, self.param_dtype
            ).astype(jnp.float32)
        y = y * mul
        if self.use_bias:
            y = y + self.param(
                "bias", self.bias_init, feature_shape, self.param_dtype
            ).astype(jnp.float32)
        return y.astype(self.dtype)

"""Post-training int8 quantization for the serving path.

v5e int8 MXU throughput is measurably higher than bf16 (179 vs
123 TOP/s on the head-conv shape — BASELINE.md), and grounding inference
is 94 % convolutions, so an int8 serving mode is real headroom past the
bf16 headline. Design:

  * :class:`QuantizableConv` is a drop-in for ``nn.Conv`` with the SAME
    parameter names/shapes (fp32 master weights) — checkpoints are
    interchangeable between quantized and bf16 serving, and training is
    untouched (quantization is inference-only);
  * weights quantize per-output-channel symmetric int8 IN-GRAPH from the
    fp32 master (two cheap elementwise passes over ~1 MB, fused by XLA —
    no separate quantized checkpoint format to maintain);
  * activations quantize per-tensor symmetric with scales CALIBRATED by
    running representative batches in ``mode="calib"`` (running max of
    |x|, stored in the ``quant`` flax collection) — then served with
    ``mode="int8"``;
  * accumulation in int32, dequantize into the conv epilogue
    (scale·bias·ReLU fuse); BatchNorm (running stats at inference),
    residual adds, the BiLSTM, and the language/grid fusion terms stay
    bf16/fp32.

``Grounder`` exposes this as ``quantize=True`` (calibrates on the first
batch). **Accuracy, measured on a trained model** (10-epoch synthetic
checkpoint): backbone+FPN int8 matches bf16 within noise (val Acc 0.305
vs 0.301). Quantizing the SHARED HEAD with one activation scale for all
five pyramid levels collapses Acc to ~0.00 — which is why activation
scales are keyed by input spatial shape (see ``scale_name`` below): the
shared head then calibrates one scale PER LEVEL, and head quantization
matches bf16 within noise (0.297 vs 0.301). With per-level scales in
place, ``cfg.quant_head`` defaults to True (the full int8 path,
+31% qps); False falls back to backbone+FPN-only int8 (+14%).
Calibration supports percentile clipping (``"calib@0.999"``) for
outlier-heavy activations; pure-max is exact on well-behaved ranges.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _quantize_sym(x: Array, scale: Array) -> Array:
    """Symmetric int8 quantization: round(x/scale) clipped to ±127."""
    q = jnp.round(x / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


class QuantizableConv(nn.Module):
    """``nn.Conv``-compatible conv with optional int8 inference.

    mode:
      * ``"off"``   — exactly ``nn.Conv`` semantics (compute in ``dtype``);
      * ``"calib"`` — fp path, plus records ``max(|x|)`` into the
        ``quant`` collection (mutable during calibration);
      * ``"int8"``  — per-tensor int8 activations × per-out-channel int8
        weights → int32 accumulate → fp epilogue.

    Param tree matches ``nn.Conv`` (``kernel``, ``bias``); the only extra
    state is ``quant/act_absmax`` (a scalar), absent until calibration.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: tuple[int, int] = (1, 1)
    percentile: float = 1.0  # calib: clip activation scale at this |x| quantile
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    mode: str = "off"
    bias_init: Any = nn.initializers.zeros_init()
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kinit = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel",
            kinit,
            (*self.kernel_size, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        dn = ("NHWC", "HWIO", "NHWC")
        pad = self.padding
        if isinstance(pad, (list, tuple)) and pad and isinstance(pad[0], (list, tuple)):
            pad = [tuple(p) for p in pad]

        # Scale variables are keyed by input spatial shape: a SHARED module
        # (the fusion head runs on all 5 pyramid levels) then calibrates
        # one scale PER LEVEL instead of one scale for all — the
        # one-scale-for-all variant collapses trained-model accuracy
        # (BASELINE.md int8 section).
        scale_name = f"act_absmax_{x.shape[1]}x{x.shape[2]}"
        if self.mode in ("off", "calib"):
            if self.mode == "calib":
                absmax = self.variable(
                    "quant", scale_name, lambda: jnp.zeros((), jnp.float32)
                )
                if not self.is_initializing():
                    a = jnp.abs(x.astype(jnp.float32))
                    # Trained activations have heavy outlier tails; a pure
                    # max blows up the scale and flattens the bulk of the
                    # distribution to ~0 codes (measured: Acc 0.30→0.02 on
                    # the synthetic-trained model). A high quantile keeps
                    # resolution where the mass is; clipped outliers
                    # saturate at ±127.
                    stat = (
                        jnp.quantile(a.reshape(-1), self.percentile)
                        if self.percentile < 1.0
                        else jnp.max(a)
                    )
                    absmax.value = jnp.maximum(absmax.value, stat)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, pad, rhs_dilation=self.kernel_dilation,
                dimension_numbers=dn, preferred_element_type=self.dtype,
            )
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y

        assert self.mode == "int8", f"unknown quant mode {self.mode!r}"
        absmax = self.variable(
            "quant", scale_name, lambda: jnp.zeros((), jnp.float32)
        )
        # Guard: an uncalibrated (zero) absmax yields act_scale=1e-6/127,
        # i.e. essentially every activation saturates at ±127 — outputs
        # are garbage but FINITE, so the failure is loud in accuracy
        # metrics, not silent NaNs. (Grounder auto-calibrates before the
        # first int8 batch, so this only fires on misuse.)
        act_scale = jnp.maximum(absmax.value, 1e-6) / 127.0
        k32 = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(k32), axis=(0, 1, 2), keepdims=True), 1e-12
        ) / 127.0  # (1,1,1,O) per-out-channel
        x_q = _quantize_sym(x.astype(jnp.float32), act_scale)
        k_q = _quantize_sym(k32, w_scale)
        y32 = jax.lax.conv_general_dilated(
            x_q, k_q, self.strides, pad, rhs_dilation=self.kernel_dilation,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        y = y32.astype(jnp.float32) * (act_scale * w_scale[0, 0, 0])
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def parse_quant_mode(mode: str) -> tuple[str, float]:
    """"calib@0.999" → ("calib", 0.999); plain modes → (mode, 1.0).

    The percentile rides inside the mode string so it threads through
    every module's existing ``quant_mode`` field without new plumbing."""
    if "@" in mode:
        base, pct = mode.split("@", 1)
        return base, float(pct)
    return mode, 1.0


def conv_for(mode: str, **kw) -> nn.Module:
    """Factory: QuantizableConv when quantization is in play, plain
    nn.Conv otherwise (identical param trees either way — nn.Conv is
    kept for the training path so its autodiff is untouched)."""
    if kw.get("kernel_init") is None:
        kw.pop("kernel_init", None)
    base, pct = parse_quant_mode(mode)
    if base == "off":
        return nn.Conv(**kw)
    return QuantizableConv(mode=base, percentile=pct, **kw)

"""Fused ResNet bottleneck block — Pallas TPU kernel (inference).

Why: the layer1 bottlenecks ([B,75,75,256], C_mid=64) are HBM-bandwidth
bound, and XLA materializes every intermediate: measured 2.41 ms/block
@B=128 vs a 0.92 ms ideal that reads x once and writes the output once
(737 MB at ~800 GB/s; MXU time is only 0.51 ms). This kernel computes

    y = relu( s3·conv1x1(relu(s2·conv3x3(relu(s1·conv1x1(x)+b1))+b2))+b3
              + residual )

entirely in VMEM per batch element: one HBM read of x, one HBM write of
y, all three convs as MXU GEMMs (the 3×3 as 9 shifted GEMMs), BatchNorm
folded into per-channel scale/bias (inference running stats), optional
projection residual (block0's downsample). Double-buffered DMA overlaps
the next image's load with the current compute.

Stride-1 blocks only (layer1's are all stride-1); equality-tested
against the module math in tests/test_pallas_bottleneck.py and compiled
equality-proven on the chip (tools/bench_bottleneck.py).

**Measured result (v5e, B=128): REJECTED for production.** XLA's
un-fused chain runs the block in 2.78 ms; this kernel measures 6.5 ms.
Two structural reasons, both documented for future rounds:
(1) the VMEM budget (~16 MB) forces single-buffered HBM DMA — a
copy-only kernel with this structure already takes 3.3 ms (239 GB/s),
above XLA's total; (2) the in-kernel compute (~3.2 ms) is ~6× the MXU
floor — XLA lowers convs through dedicated systolic paths that 9
shifted GEMMs + VPU masking do not approach. The bandwidth thesis was
right (XLA runs at 266 GB/s of x+y traffic vs the ~800 GB/s ideal) but
beating the conv compiler on its own op requires pipelined multi-slot
DMA + better Mosaic scheduling than this budget allows. Kept as a
working reference for Pallas DMA/alignment/VMEM-budget patterns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm (inference) → per-channel (s, b): y = s·x + b."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def _kernel(
    x_hbm, w1, s1, b1, w2, s2, b2, w3, s3, b3, wd, sd, bd,
    out_hbm, xt, h1_buf, yband, sems, *, H, W, HP, WP, Cin, Cmid, Cout,
    has_proj, out_dtype,
):
    # h1_buf holds THREE dx-shifted copies of h1 (shape (3, rows, WP,
    # Cmid)) so the 9 window reads in stage 2 are fully aligned — the
    # sublane (W-dim) shifts happen once per band here instead of 9× per
    # band there (sublane-offset slices were the kernel's original
    # bottleneck: 6.5 ms/block vs XLA's 2.8).
    # Geometry: I/O arrays are (B, H, WP, C) with WP = W rounded up to 8
    # and ZEROS beyond column W (caller contract, preserved by the masked
    # store) — DMA offsets/extents stay aligned to the bf16 (8,128)(2,1)
    # tiling. In-tile the data region sits at [1:H+1, 8:8+WP]: row 0 /
    # row H+1 and column 7 are never written (the 3×3 conv's zero
    # padding); columns ≥ 8+W hold the caller's zeros. Rows are an
    # untiled major dim, so the per-band value slices below are free.
    # VMEM budget forces (a) a single input slot (the DMA is ~4 µs per
    # image vs ~10 µs compute — acceptable serialization), (b) h1 staged
    # through a persistent scratch, (c) banded compute for stages 2–3.
    b = pl.program_id(0)

    def dma(batch_idx):
        return pltpu.make_async_copy(
            x_hbm.at[batch_idx],
            xt.at[0, pl.ds(1, H), pl.ds(8, WP), :],
            sems.at[0],
        )

    def out_dma(batch_idx, r0, bt):
        return pltpu.make_async_copy(
            yband.at[pl.ds(0, bt)],
            out_hbm.at[batch_idx, pl.ds(r0, bt)],
            sems.at[1],
        )

    @pl.when(b == 0)
    def _():
        xt[...] = jnp.zeros_like(xt)  # halo cells stay zero forever
        h1_buf[...] = jnp.zeros_like(h1_buf)

    dma(b).start()
    dma(b).wait()

    mm = lambda a, w: jax.lax.dot_general(  # noqa: E731
        a, w, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # Stage 1 — conv1 (1×1) + BN + ReLU, banded over rows, masked outside
    # the real-data region (relu(b1) would otherwise leak into conv2's
    # zero padding); stored as 3 dx-shifted aligned copies.
    BT = 16
    TR = -(-(HP + 8) // BT) * BT  # xt rows, band-aligned
    cols = jax.lax.broadcasted_iota(jnp.int32, (BT, WP + 16, 1), 1)
    col_ok = (cols > 7) & (cols < 8 + W)
    for r0 in range(0, TR, BT):
        rows = jax.lax.broadcasted_iota(jnp.int32, (BT, WP + 16, 1), 0) + r0
        band = jnp.maximum(
            mm(xt[0, r0 : r0 + BT], w1[...]) * s1[...] + b1[...], 0.0
        )
        keep = (rows > 0) & (rows < H + 1) & col_ok
        band = jnp.where(keep, band, 0.0).astype(jnp.bfloat16)
        for dx in range(3):
            h1_buf[dx, r0 : r0 + BT] = band[:, 7 + dx : 7 + dx + WP, :]

    # Stages 2+3 — 3×3 conv (9 GEMMs over aligned shifted copies),
    # BN+ReLU, 1×1 conv, BN, residual, ReLU, masked store; banded over
    # output rows. Output cell (i, j) is tile position (i+1, j+8):
    # window sum Σ h1[i+dy, j+7+dx] = Σ h1_buf[dx][i+dy, j].
    ocols = jax.lax.broadcasted_iota(jnp.int32, (BT, WP, 1), 1)
    for r0 in range(0, H, BT):
        bt = min(BT, H - r0)
        acc = jnp.zeros((BT, WP, Cmid), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += mm(
                    h1_buf[dx, r0 + dy : r0 + dy + BT, :, :],
                    w2[dy * 3 + dx],
                )
        h2 = jnp.maximum(acc * s2[...] + b2[...], 0.0).astype(jnp.bfloat16)
        y = mm(h2, w3[...]) * s3[...] + b3[...]
        res = xt[0, r0 + 1 : r0 + 1 + BT, 8 : 8 + WP, :]
        if has_proj:
            y = y + (mm(res, wd[...]) * sd[...] + bd[...])
        else:
            y = y + res.astype(jnp.float32)
        y = jnp.where(ocols < W, jnp.maximum(y, 0.0), 0.0).astype(out_dtype)
        if r0 > 0:  # previous band's store must land before reuse
            out_dma(b, r0 - BT, BT).wait()
        yband[...] = y
        out_dma(b, r0, bt).start()
    out_dma(b, (H - 1) // BT * BT, H - (H - 1) // BT * BT).wait()


def fused_bottleneck_infer(
    x: Array,
    w1: Array, s1: Array, b1: Array,
    w2: Array, s2: Array, b2: Array,
    w3: Array, s3: Array, b3: Array,
    wd: Array | None = None, sd: Array | None = None, bd: Array | None = None,
) -> Array:
    """One inference bottleneck block, fused.

    x: (B, H, W, Cin) bf16/f32; w1: (Cin, Cmid); w2: (3, 3, Cmid, Cmid);
    w3: (Cmid, Cout); s*/b*: folded BN per-channel scale/bias (see
    :func:`fold_bn`); wd/sd/bd: optional 1×1 projection residual
    (required when Cin != Cout). Stride 1 only.
    """
    B, H, W, Cin = x.shape
    HP = -(-H // 8) * 8
    WP = -(-W // 8) * 8
    Cmid = w1.shape[1]
    Cout = w3.shape[1]
    has_proj = wd is not None
    if not has_proj:
        assert Cin == Cout, "identity residual needs Cin == Cout"
    xb = x.astype(jnp.bfloat16)
    if WP != W:  # kernel contract: W padded to 8, zeros beyond (chaining
        # blocks keeps the padded layout; see fused_bottleneck_chain)
        xb = jnp.pad(xb, ((0, 0), (0, 0), (0, WP - W), (0, 0)))
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)  # noqa: E731
    w2f = jnp.asarray(w2, jnp.bfloat16).reshape(9, Cmid, Cmid)
    args = [
        xb,
        jnp.asarray(w1, jnp.bfloat16), row(s1), row(b1),
        w2f, row(s2), row(b2),
        jnp.asarray(w3, jnp.bfloat16), row(s3), row(b3),
        jnp.asarray(wd, jnp.bfloat16) if has_proj else jnp.zeros((1, 1), jnp.bfloat16),
        row(sd) if has_proj else jnp.zeros((1, 1), jnp.float32),
        row(bd) if has_proj else jnp.zeros((1, 1), jnp.float32),
    ]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, H=H, W=W, HP=HP, WP=WP, Cin=Cin, Cmid=Cmid, Cout=Cout,
        has_proj=has_proj, out_dtype=x.dtype,
    )
    TR = -(-(HP + 8) // 16) * 16  # scratch rows, band-aligned
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vspec] * 12,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, WP, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, TR, WP + 16, Cin), jnp.bfloat16),
            pltpu.VMEM((3, TR + 16, WP, Cmid), jnp.bfloat16),
            pltpu.VMEM((16, WP, Cout), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14.5 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * (Cin * Cmid + 9 * Cmid * Cmid + Cmid * Cout
                                   + (Cin * Cout if has_proj else 0)),
            bytes_accessed=B * H * W * (Cin + Cout) * 2,
            transcendentals=0,
        ),
    )(*args)
    return out[:, :, :W, :] if WP != W else out


def bottleneck_infer_reference(
    x, w1, s1, b1, w2, s2, b2, w3, s3, b3, wd=None, sd=None, bd=None
):
    """Pure-jnp oracle for the kernel (same argument convention)."""
    dn = ("NHWC", "HWIO", "NHWC")
    f32 = jnp.float32
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), jnp.asarray(w1, jnp.bfloat16)[None, None],
        (1, 1), "VALID", dimension_numbers=dn, preferred_element_type=f32,
    )
    h = jnp.maximum(h * s1 + b1, 0).astype(jnp.bfloat16)
    h = jax.lax.conv_general_dilated(
        h, jnp.asarray(w2, jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=f32,
    )
    h = jnp.maximum(h * s2 + b2, 0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        h, jnp.asarray(w3, jnp.bfloat16)[None, None], (1, 1), "VALID",
        dimension_numbers=dn, preferred_element_type=f32,
    )
    y = y * s3 + b3
    if wd is not None:
        r = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), jnp.asarray(wd, jnp.bfloat16)[None, None],
            (1, 1), "VALID", dimension_numbers=dn, preferred_element_type=f32,
        )
        y = y + (r * sd + bd)
    else:
        y = y + x.astype(f32)
    return jnp.maximum(y, 0).astype(x.dtype)

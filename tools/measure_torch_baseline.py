"""Measured PyTorch baseline for the qps protocol (VERDICT r1 #5).

The reference publishes no throughput and no V100 exists here, so the
baseline chain is: (1) MEASURE the reference-shaped torch ZSGNet (the
same oracle the conversion-parity tests use) on this host's CPU, eager
fp32 eval — hard data replacing round-1's bare 150-qps guess; (2) anchor
the V100 figure to public eager-PyTorch ResNet-50 V100 throughput scaled
by the FLOP ratio (method documented below and in BASELINE.md).

V100 derivation (fp32 eager, the reference's actual regime — a 2019
pure-PyTorch repo, no AMP):
    eager ResNet-50 fp32 V100 ≈ 800 img/s @ 224² (widely reproduced
    NGC/community figure) → effective ≈ 800 × 8.2 GF = 6.6 TFLOP/s
    ZSGNet fwd ≈ 21.5 GF/query → V100 ≈ 6.6e12 / 21.5e9 ≈ 307 qps
    AMP/fp16 upper bound ≈ 2× → ≈ 614 qps
bench.py uses V100_REF_QPS = 307 (fp32 eager); the north-star >5×/chip
must also clear the AMP bound.
"""

import sys, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))  # reuse the torch oracle model

import time

import numpy as np
import torch

from test_convert_full import TorchZSGNet  # noqa: E402

from zsgnet_tpu.config import get_default_cfg  # noqa: E402
from zsgnet_tpu.utils.profiling import flops_estimate  # noqa: E402

torch.set_num_threads(torch.get_num_threads())

cfg = get_default_cfg()
FLOPS = flops_estimate(cfg)
model = TorchZSGNet(
    vocab=10000, emb_dim=cfg.emb_dim, hidden=cfg.lstm_dim,
    fpn_ch=cfg.fpn_ch, head_ch=cfg.head_ch, num_anchors=cfg.num_anchors,
).eval()

B = 2
rng = np.random.default_rng(0)
img = torch.tensor(rng.normal(size=(B, 3, 300, 300)).astype(np.float32))
qvec = torch.tensor(rng.integers(1, 10000, size=(B, cfg.max_qlen)).astype(np.int64))
qlens = torch.tensor(np.full((B,), 6, np.int32))

with torch.no_grad():
    model(img, qvec, qlens)  # warm
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < 45.0:
        model(img, qvec, qlens)
        iters += 1
dt = (time.perf_counter() - t0) / iters
qps_cpu = B / dt
eff = FLOPS * qps_cpu

print(f"torch eager fp32, {torch.get_num_threads()} thread(s), B={B}: "
      f"{qps_cpu:.3f} qps ({dt*1e3:.0f} ms/batch, {iters} iters)")
print(f"model fwd ≈ {FLOPS/1e9:.1f} GF/query → CPU effective {eff/1e9:.1f} GFLOP/s")
print()
print("V100 anchor (documented derivation, see module docstring):")
v100_fp32 = 6.6e12 / FLOPS
print(f"  fp32 eager: ≈ {v100_fp32:.0f} qps   (6.6 TFLOP/s effective)")
print(f"  AMP bound:  ≈ {2*v100_fp32:.0f} qps")
print()
print("BASELINE.md rows:")
print(f"| torch ZSGNet fwd, this host CPU (1×Xeon 2.1GHz, eager fp32) "
      f"| {qps_cpu:.2f} qps | measured, tools/measure_torch_baseline.py |")
print(f"| est. V100 fp32 eager (derivation above) | ≈{v100_fp32:.0f} qps | "
      f"anchored to public ResNet-50 V100 ≈800 img/s, FLOP-scaled |")

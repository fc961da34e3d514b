"""A/B inference bench on the chip: per-level head vs canvas-packed head.

Same protocol as bench.py (steady-state grounding forward + top-anchor
decode, long loop closed by a value fetch). Usage:

    timeout 580 python tools/bench_infer_ab.py [B]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.models.zsgnet import anchor_components_for, get_default_net
from zsgnet_tpu.ops.level_ops import decode_best_box_levels

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
rng = np.random.default_rng(0)
base = get_default_cfg().replace(bs=B, do_dist=False)
h, w = base.resize_img
batch = {
    "img": jnp.asarray(rng.integers(0, 255, size=(B, h, w, 3)).astype(np.uint8)),
    "qvec": jnp.asarray(rng.integers(1, 10000, size=(B, base.max_qlen)).astype(np.int32)),
    "qlens": jnp.asarray(rng.integers(3, 12, size=(B,)).astype(np.int32)),
}
print(f"B={B} platform={jax.devices()[0].platform}", flush=True)

variables = None
quant_vars = None
for name, cfg in (
    ("per-level", base),
    ("canvas", base.replace(head_canvas=True)),
    ("int8", base.replace(quant_mode="int8")),
):
    model = get_default_net(cfg, vocab_size=10000)
    if variables is None:  # identical param tree — init once, share
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), batch
        )
    v = variables
    if cfg.quant_mode == "int8":
        if quant_vars is None:
            calib = get_default_net(
                base.replace(quant_mode="calib@0.999"), vocab_size=10000
            )
            _, qv = jax.jit(
                lambda v, b: calib.apply(v, b, train=False, mutable=["quant"])
            )(variables, batch)
            quant_vars = qv["quant"]
        v = {**variables, "quant": quant_vars}
    comps = anchor_components_for(cfg)

    @jax.jit
    def infer(variables, batch, model=model, comps=comps):
        out = model.apply(variables, batch, train=False)
        return decode_best_box_levels(out["att_levels"], out["delta_levels"], comps)

    for _ in range(3):
        out = infer(v, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    N = 100
    for _ in range(N):
        out = infer(v, batch)
    s0 = float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:10s} {dt*1000:7.2f} ms  {B/dt:8.1f} qps  (checksum {s0:.4f})", flush=True)

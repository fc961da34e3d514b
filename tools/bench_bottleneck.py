"""Fused Pallas bottleneck vs XLA on the chip, at the layer1 shape.

Compiled equality assert + scan-chained timing (tunnel discipline).
Usage: timeout 1100 python tools/bench_bottleneck.py [B]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from zsgnet_tpu.ops.pallas.fused_bottleneck import (
    bottleneck_infer_reference,
    fused_bottleneck_infer,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = 75
Cin, Cm = 256, 64
rng = np.random.default_rng(0)
f = lambda *s, sc=0.2: jnp.asarray(rng.normal(size=s).astype(np.float32) * sc)
x = f(B, H, W, Cin, sc=1.0).astype(jnp.bfloat16)
args = dict(
    w1=f(Cin, Cm), s1=f(Cm) + 1.0, b1=f(Cm),
    w2=f(3, 3, Cm, Cm), s2=f(Cm) + 1.0, b2=f(Cm),
    w3=f(Cm, Cin), s3=f(Cin) + 1.0, b3=f(Cin),
)

print(f"B={B} platform={jax.devices()[0].platform}", flush=True)

ref = jax.jit(lambda x: bottleneck_infer_reference(x, **args))
fused = jax.jit(lambda x: fused_bottleneck_infer(x, **args))
want = ref(x)
got = fused(x)
d = jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
scale = jnp.max(jnp.abs(want.astype(jnp.float32)))
print(f"compiled equality: max|diff|={float(d):.4f}  scale={float(scale):.2f}", flush=True)
assert float(d) / max(float(scale), 1e-6) < 0.05, "fused kernel diverges"

N = 50
for name, fn in (("xla", ref), ("pallas-fused", fused)):
    @jax.jit
    def chain(x, fn=fn):
        def body(c, _):
            return (fn(c) * jnp.bfloat16(0.25)).astype(x.dtype), None
        return jax.lax.scan(body, x, None, length=N)[0]

    out = chain(x); float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = chain(x); float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N
    bw = 2 * B * H * W * Cin * 2 / dt / 1e9
    print(f"{name:13s}: {dt*1000:7.3f} ms/block  (effective {bw:.0f} GB/s of x+y traffic)", flush=True)

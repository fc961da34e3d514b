"""Fused bottleneck kernel (ops/pallas/fused_bottleneck.py) correctness.

Interpreter-mode on CPU (the chip benchmark lives in
tools/bench_bottleneck.py); exact-vs-oracle within bf16 tolerance for
both the identity-residual and projection-residual variants, plus the
flax-Bottleneck-equivalence path used by the serving integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from zsgnet_tpu.ops.pallas.fused_bottleneck import (
    bottleneck_infer_reference,
    fold_bn,
    fused_bottleneck_infer,
)


def _mk(rng, B=2, H=11, W=9, Cin=16, Cmid=8, Cout=16, proj=False):
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    x = f(B, H, W, Cin)
    args = dict(
        w1=f(Cin, Cmid), s1=f(Cmid) + 1.0, b1=f(Cmid),
        w2=f(3, 3, Cmid, Cmid), s2=f(Cmid) + 1.0, b2=f(Cmid),
        w3=f(Cmid, Cout), s3=f(Cout) + 1.0, b3=f(Cout),
    )
    if proj:
        args.update(wd=f(Cin, Cout), sd=f(Cout) + 1.0, bd=f(Cout))
    return x, args


@pytest.mark.parametrize("proj", [False, True])
def test_fused_bottleneck_matches_oracle(rng, proj):
    x, args = _mk(rng, proj=proj)
    want = np.asarray(bottleneck_infer_reference(x, **args))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_bottleneck_infer(x, **args))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # interior exactness is what matters; also check no NaN/inf
    assert np.isfinite(got).all()


@pytest.mark.parametrize("Cin,Cm", [(32, 8), (16, 8)])  # identity / projection
def test_fused_bottleneck_matches_flax_block(rng, Cin, Cm):
    """fold_bn + kernel == models.resnet.Bottleneck in inference mode."""
    from zsgnet_tpu.models.resnet import Bottleneck

    B, H, W = 2, 9, 9
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    block = Bottleneck(features=Cm, stride=1, dtype=jnp.float32)
    v = block.init(jax.random.PRNGKey(0), x, False)
    params, stats = v["params"], v["batch_stats"]
    # randomize BN stats so folding is non-trivial
    import numpy as rnp

    r2 = rnp.random.default_rng(1)
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            r2.uniform(0.6, 1.4, a.shape).astype(np.float32)
        ),
        stats,
    )
    want = np.asarray(block.apply({"params": params, "batch_stats": stats}, x, False))

    def fb(name):
        return fold_bn(
            params[name]["scale"], params[name]["bias"],
            stats[name]["mean"], stats[name]["var"],
        )

    s1, b1 = fb("bn1")
    s2, b2 = fb("bn2")
    s3, b3 = fb("bn3")
    proj = {}
    if "downsample_conv" in params:
        sd, bd = fb("downsample_bn")
        proj = dict(wd=params["downsample_conv"]["kernel"][0, 0], sd=sd, bd=bd)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_bottleneck_infer(
                x,
                params["conv1"]["kernel"][0, 0], s1, b1,
                params["conv2"]["kernel"], s2, b2,
                params["conv3"]["kernel"][0, 0], s3, b3,
                **proj,
            )
        )
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

"""TPU compiler-flag sweep on the production train step (VERDICT r2 #5b).

``XLA_FLAGS`` cannot tune the TPU compiler in this environment — the
local client is a CPU build that hard-rejects TPU flag names
("Unknown flag in XLA_FLAGS: --xla_tpu_…", parse_flags_from_env.cc) and
the compile itself happens on the remote axon server. But PJRT
``compiler_options`` DO ship with the compile request: a bogus option
name comes back as a server-side tpu_compile_helper error, and real TPU
flags compile — proven by probe this round. So the sweep goes through
``jit(...).lower(...).compile(compiler_options=…)``.

Usage: timeout 1800 python tools/sweep_compile_flags.py [B] [--resize=N]
                    [--infer] [--int8]
Default sweeps the train step; ``--infer`` sweeps the serving forward
(bench.py's protocol: full forward + top-anchor decode, uint8 input),
``--infer --int8`` the calibrated int8 serving path. Each variant is
compiled fresh (several minutes each over the tunnel) and timed — train
over 20 steps, inference over 100 iters closed by a value fetch (the
tunnel's block_until_ready under-reports short loops). Results feed
BASELINE.md's round-3 tables.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128
RESIZE = next(
    (int(a.split("=")[1]) for a in sys.argv if a.startswith("--resize=")), 300
)
INFER = "--infer" in sys.argv
INT8 = "--int8" in sys.argv
QUICK = "--quick" in sys.argv  # baseline + best-known value only (600² runs)

# Each entry: (label, compiler_options dict). Baseline = no overrides.
# Round-1 sweep results (chip): baseline 126.5 / vmem=32M 125.1 /
# vmem=64M 129.8 ms; unknown flag names fail loudly server-side (good).
VARIANTS = [
    ("baseline", None),
    ("baseline2", None),  # repeat: spread of the no-flag measurement
    # VMEM budget for fused loops/convs: more scoped VMEM can deepen
    # fusion tiles; too much starves the conv scheduler.
    ("vmem=24M", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("vmem=32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem=32M.2", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem=40M", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
]
if "--quick" in sys.argv:
    VARIANTS = [VARIANTS[0], VARIANTS[2]]  # baseline + vmem=24M

# --extended: fine-tune scoped VMEM around the accepted 24576 and probe
# candidate fusion/scheduling flags STACKED on it (so gains read against
# the shipped default). Flag names come from public XLA/libtpu usage;
# unknown names are rejected by the server in seconds (probe-proven), so
# speculative entries cost almost nothing — only valid ones compile.
_V24 = {"xla_tpu_scoped_vmem_limit_kib": "24576"}
if "--extended" in sys.argv:
    VARIANTS = [
        ("baseline", None),
        ("vmem=24M", dict(_V24)),
        ("vmem=20M", {"xla_tpu_scoped_vmem_limit_kib": "20480"}),
        ("vmem=26M", {"xla_tpu_scoped_vmem_limit_kib": "26624"}),
        ("vmem=28M", {"xla_tpu_scoped_vmem_limit_kib": "28672"}),
        ("24M+rwb-off", {**_V24, "xla_tpu_rwb_fusion": "false"}),
        ("24M+licm2x", {**_V24, "xla_tpu_licm_size_inflation_ratio": "2.0"}),
        ("24M+bundle-cm", {**_V24, "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
        ("24M+nested-fusion", {**_V24, "xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
        ("24M+dot-dot", {**_V24, "xla_tpu_dot_dot_fusion": "true"}),
        ("24M+vloadwin", {**_V24, "xla_tpu_vector_load_fusion_window": "2048"}),
        ("24M+cm-scale", {**_V24, "xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}),
    ]


def main_infer() -> None:
    """Sweep compiler options on the serving forward (bench.py protocol)."""
    from zsgnet_tpu.models.zsgnet import anchor_components_for
    from zsgnet_tpu.ops.level_ops import decode_best_box_levels

    cfg = get_default_cfg().replace(
        bs=B, do_dist=False, resize_img=(RESIZE, RESIZE),
        tpu_vmem_kib=0,  # options come from VARIANTS; keep baseline clean
    )
    model = get_default_net(cfg, vocab_size=10000)
    rng = np.random.default_rng(0)
    h, w = cfg.resize_img
    batch = {
        "img": jnp.asarray(rng.integers(0, 255, (B, h, w, 3)).astype(np.uint8)),
        "qvec": jnp.asarray(rng.integers(1, 10000, (B, cfg.max_qlen)).astype(np.int32)),
        "qlens": jnp.asarray(rng.integers(3, 12, (B,)).astype(np.int32)),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    anchor_comps = anchor_components_for(cfg)

    if INT8:
        # Mirror bench.py: calibrate per-level activation scales on this
        # batch, then sweep the quantized forward.
        model_i8 = get_default_net(
            cfg.replace(quant_mode="int8"), vocab_size=10000
        )
        calib = get_default_net(
            cfg.replace(quant_mode="calib@0.999"), vocab_size=10000
        )
        _, qv = jax.jit(
            lambda v, b: calib.apply(v, b, train=False, mutable=["quant"])
        )(variables, batch)
        variables = {**variables, "quant": qv["quant"]}
        apply_model = model_i8
    else:
        apply_model = model

    def infer(variables, batch):
        out = apply_model.apply(variables, batch, train=False)
        return decode_best_box_levels(
            out["att_levels"], out["delta_levels"], anchor_comps
        )

    jitted = jax.jit(infer)
    results = []
    for label, opts in VARIANTS:
        t0 = time.time()
        try:
            lowered = jitted.lower(variables, batch)
            compiled = (
                lowered.compile(compiler_options=opts) if opts else lowered.compile()
            )
        except Exception as e:
            print(f"{label}: COMPILE FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        compile_s = time.time() - t0
        for _ in range(3):
            jax.block_until_ready(compiled(variables, batch))
        t0 = time.perf_counter()
        N = 100
        for _ in range(N):
            out = compiled(variables, batch)
        float(jnp.sum(out[0]))  # value fetch closes the queued pipeline
        wall = (time.perf_counter() - t0) / N
        results.append((label, wall))
        print(
            f"{label}: {wall*1000:.2f} ms  {B/wall:.0f} qps  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )
    if results:
        best = min(results, key=lambda r: r[1])
        print(f"best: {best[0]} at {best[1]*1000:.2f} ms")


def main() -> None:
    cfg = get_default_cfg().replace(
        bs=B, do_dist=False, bn_variance="shifted",
        resize_img=(RESIZE, RESIZE),
        tpu_vmem_kib=0,  # options come from VARIANTS; keep baseline clean
    )
    model = get_default_net(cfg, vocab_size=10000)
    rng = np.random.default_rng(0)
    h, w = cfg.resize_img
    batch = {
        "img": jnp.asarray(rng.integers(0, 255, (B, h, w, 3)).astype(np.uint8)),
        "qvec": jnp.asarray(rng.integers(1, 10000, (B, cfg.max_qlen)).astype(np.int32)),
        "qlens": jnp.asarray(rng.integers(3, 12, (B,)).astype(np.int32)),
        "annot": jnp.asarray(
            np.stack(
                [rng.uniform(-0.9, -0.1, (B, 2)), rng.uniform(0.1, 0.9, (B, 2))],
                axis=1,
            ).reshape(B, 4).astype(np.float32)
        ),
    }
    step = make_train_step(cfg, anchor_pyramid_for(cfg), mesh=None)

    results = []
    for label, opts in VARIANTS:
        # Fresh state per variant: the step donates its input state.
        state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
        t0 = time.time()
        try:
            lowered = step.lower(state, batch)
            compiled = (
                lowered.compile(compiler_options=opts) if opts else lowered.compile()
            )
        except Exception as e:  # unknown/rejected flag → server-side error
            print(f"{label}: COMPILE FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        compile_s = time.time() - t0
        for _ in range(3):
            state, ls = compiled(state, batch)
        float(ls["total"])
        t0 = time.perf_counter()
        N = 20
        for _ in range(N):
            state, ls = compiled(state, batch)
        float(ls["total"])
        wall = (time.perf_counter() - t0) / N
        results.append((label, wall))
        print(
            f"{label}: {wall*1000:.1f} ms/step  {B/wall:.0f} qps  "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )

    if results:
        best = min(results, key=lambda r: r[1])
        print(f"best: {best[0]} at {best[1]*1000:.1f} ms/step")


if __name__ == "__main__":
    main_infer() if INFER else main()

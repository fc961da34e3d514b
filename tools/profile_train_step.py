"""Where does the train step's time go? Trace it on the chip and aggregate.

Runs the production train step (retina 300², level-path loss, Adam) at a
given batch size under ``jax.profiler``, then parses the perfetto trace and
aggregates device-op durations by HLO-name heuristics (conv fwd vs dgrad vs
wgrad, LSTM scan, loss, optimizer, copies). This is the measurement VERDICT
r1 #6 asks for before touching the "backbone backward" frontier.

Usage: timeout 580 python tools/profile_train_step.py [B] [--remat]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128
REMAT = "--remat" in sys.argv
CANVAS = "--canvas" in sys.argv
NOTRACE = "--notrace" in sys.argv

BN_MODE = (
    "shifted16" if "--bnshift16" in sys.argv
    else "shifted" if "--bnshift" in sys.argv
    else "fast" if "--bnfast" in sys.argv
    else "exact"
)
RESIZE = next(
    (int(a.split("=")[1]) for a in sys.argv if a.startswith("--resize=")), 300
)

VMEM = next(
    (int(a.split("=")[1]) for a in sys.argv if a.startswith("--vmem=")), 0
)

GRAD_ACCUM = next(
    (int(a.split("=")[1]) for a in sys.argv if a.startswith("--grad_accum=")), 1
)

cfg = get_default_cfg().replace(
    bs=B, do_dist=False, remat_backbone=REMAT, head_canvas=CANVAS,
    bn_variance=BN_MODE, resize_img=(RESIZE, RESIZE),
    spd_stem="--spd" in sys.argv, tpu_vmem_kib=VMEM, grad_accum=GRAD_ACCUM,
)
model = get_default_net(cfg, vocab_size=10000)
rng = np.random.default_rng(0)
h, w = cfg.resize_img
batch = {
    "img": jnp.asarray(rng.integers(0, 255, size=(B, h, w, 3)).astype(np.uint8)),
    "qvec": jnp.asarray(rng.integers(1, 10000, size=(B, cfg.max_qlen)).astype(np.int32)),
    "qlens": jnp.asarray(rng.integers(3, 12, size=(B,)).astype(np.int32)),
    "annot": jnp.asarray(
        np.stack([rng.uniform(-0.9, -0.1, size=(B, 2)), rng.uniform(0.1, 0.9, size=(B, 2))], axis=1)
        .reshape(B, 4)
        .astype(np.float32)
    ),
}

state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
anchors = anchor_pyramid_for(cfg)
if "--infer" in sys.argv:
    from zsgnet_tpu.models.zsgnet import anchor_components_for
    from zsgnet_tpu.ops.level_ops import decode_best_box_levels

    comps = anchor_components_for(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def _infer(variables, batch):
        out = model.apply(variables, batch, train=False)
        box, score = decode_best_box_levels(out["att_levels"], out["delta_levels"], comps)
        return {"total": jnp.sum(box)}, box

    step = lambda s, b: (s, _infer(variables, b)[0])  # noqa: E731
else:
    step = make_train_step(cfg, anchors, mesh=None)

print(
    f"B={B} remat={REMAT} canvas={CANVAS} grad_accum={GRAD_ACCUM} "
    f"platform={jax.devices()[0].platform}",
    flush=True,
)
for _ in range(3):
    state, ls = step(state, batch)
float(ls["total"])  # force

# HBM peak (the number grad_accum exists to shrink). memory_stats() is
# backend-dependent — absent on CPU and some PJRT plugins.
stats = jax.local_devices()[0].memory_stats() or {}
peak = stats.get("peak_bytes_in_use")
if peak is not None:
    print(f"HBM peak: {peak / 2**30:.2f} GiB "
          f"(limit {stats.get('bytes_limit', 0) / 2**30:.2f} GiB)", flush=True)

# Wall-clock (long loop, value-close — tunnel discipline)
t0 = time.perf_counter()
N = 30
for _ in range(N):
    state, ls = step(state, batch)
float(ls["total"])
wall = (time.perf_counter() - t0) / N
print(f"wall: {wall*1000:.1f} ms/step  {B/wall:.0f} qps", flush=True)

if NOTRACE:
    sys.exit(0)

# Trace a few steps
logdir = "/tmp/zsg_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir, create_perfetto_trace=True)
for _ in range(3):
    state, ls = step(state, batch)
float(ls["total"])
jax.profiler.stop_trace()

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, f"no trace found under {logdir}"
with gzip.open(paths[0], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# Find device-track pids (TPU/device tracks carry XLA op events).
pid_names = {}
tid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
if not device_pids:  # fall back: any pid with XLA Ops thread
    device_pids = {p for (p, t), n in tid_names.items() if "XLA Op" in n or "Steps" in n}

agg = defaultdict(float)
op_agg = defaultdict(float)
op_long = {}
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in device_pids:
        continue
    tname = tid_names.get((e["pid"], e["tid"]), "")
    if "XLA Op" not in tname and "Ops" not in tname:
        continue
    dur = e.get("dur", 0) / 1e3  # us → ms
    args = e.get("args") or {}
    cat = args.get("hlo_category", "unknown")
    total += dur
    agg[cat] += dur
    op_agg[e["name"]] += dur
    op_long.setdefault(e["name"], args.get("long_name", "")[:160])

steps_traced = 3
print(f"\ndevice total: {total/steps_traced:.1f} ms/step (traced {steps_traced})")
print("\nby category (ms/step):")
for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
    print(f"  {k:22s} {v/steps_traced:8.2f}  ({100*v/total:4.1f}%)")
print("\ntop 30 ops (ms/step):")
for k, v in sorted(op_agg.items(), key=lambda kv: -kv[1])[:30]:
    print(f"  {v/steps_traced:8.3f}  {k[:60]:60s}  {op_long.get(k, '')[:120]}")

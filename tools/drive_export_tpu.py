"""Drive the AOT export path on the real TPU.

CPU tests prove the ("cpu",) lowering; this proves the DEPLOYMENT claim:
a ("tpu",) StableHLO artifact written by ``export_serving`` executes on
an actual chip and reproduces the live Grounder. Full 300² retina
config (the shipped serving architecture).

The model is trained ~40 steps on a synthetic batch first — NOT for
accuracy, but to make the top-anchor argmax decisive: at random init
all 17451 anchor scores are near-ties, and the ≈1e-4 bf16 wobble
between the tuned live jit (scoped-VMEM compiler options) and the
artifact's untuned compile legitimately flips which box wins (observed:
Δscore 1.8e-4, box flip). A trained head has decisive margins, so box
disagreement again means a real export bug.

Usage: timeout 1100 python tools/drive_export_tpu.py [batch_size]
"""
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

print("devices:", jax.devices())
assert jax.default_backend() == "tpu", "this drive needs the real chip"

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.export import ExportedGrounder, export_serving
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

cfg = get_default_cfg().replace(bs=BS, do_dist=False)
vocab = Vocab.build(["a man in a red shirt", "the dog by the blue car door"])
model = get_default_net(cfg, vocab_size=len(vocab))
rng = np.random.default_rng(0)
h, w = cfg.resize_img
init_batch = {
    "img": np.zeros((BS, h, w, 3), np.uint8),
    "qvec": np.ones((BS, cfg.max_qlen), np.int32),
    "qlens": np.full((BS,), 4, np.int32),
}
# ~40 steps on one synthetic batch → decisive argmax margins (see module
# docstring). Loss must drop or the comparison below is meaningless.
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for
from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

train_batch = {
    **{k: jax.numpy.asarray(v) for k, v in init_batch.items()},
    "img": jax.numpy.asarray(
        rng.integers(0, 255, (BS, h, w, 3)).astype(np.uint8)
    ),
    "annot": jax.numpy.asarray(
        np.stack(
            [rng.uniform(-0.9, -0.1, (BS, 2)), rng.uniform(0.1, 0.9, (BS, 2))],
            axis=1,
        ).reshape(BS, 4).astype(np.float32)
    ),
}
t0 = time.time()
step = make_train_step(cfg, anchor_pyramid_for(cfg), mesh=None)
state = create_train_state(cfg, model, train_batch, jax.random.PRNGKey(0))
loss0 = None
for i in range(40):
    state, metrics = step(state, train_batch)
    if i == 0:
        loss0 = float(metrics["total"])
lossN = float(metrics["total"])
print(f"train 40 steps: {time.time()-t0:.0f}s  loss {loss0:.3f} -> {lossN:.3f}")
assert lossN < loss0, "training did not reduce loss"

variables = {"params": state.params}
if state.batch_stats:
    variables["batch_stats"] = state.batch_stats
g = Grounder(cfg, vocab, variables, batch_size=BS)

imgs = [rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8) for _ in range(BS)]
queries = (["a man in a red shirt", "the dog by the blue car"] * BS)[:BS]

t0 = time.time()
live = g.ground(imgs, queries)
print(f"live Grounder: {time.time()-t0:.0f}s (compile+run)")

with tempfile.TemporaryDirectory() as td:
    t0 = time.time()
    art = export_serving(g, td, platforms=("tpu",))
    size_mb = (art / "serving_fn.stablehlo").stat().st_size / 1e6
    print(f"export: {time.time()-t0:.0f}s, artifact {size_mb:.1f} MB")
    t0 = time.time()
    served = ExportedGrounder.load(art)
    exported = served.ground(imgs, queries)
    print(f"artifact load+serve: {time.time()-t0:.0f}s")

    # Steady-state live vs artifact (the loader re-applies the tuned
    # compiler options — BASELINE.md): close each iter with a scalar
    # fetch (tunnel async under-reports block_until_ready on arrays).
    # NOTE: each iter pays a ~50 ms tunnel round trip, so these numbers
    # are RELATIVE only — the claim is "artifact is not slower than
    # live" (both pay the same RTT), not an absolute latency (that's
    # tools/bench_infer_ab.py's job, measured 2.78 ms @B=8 canvas).
    enc = [vocab.encode(q, cfg.max_qlen) for q in queries]
    dev = {
        "img": jax.numpy.asarray(np.stack(imgs)),
        "qvec": jax.numpy.asarray(np.stack([ids for ids, _ in enc]).astype(np.int32)),
        "qlens": jax.numpy.asarray(np.array([n for _, n in enc], np.int32)),
    }
    def _time(fn, iters=30):
        fn(dev["img"], dev["qvec"], dev["qlens"])  # warm
        t0 = time.time()
        for _ in range(iters):
            _, s = fn(dev["img"], dev["qvec"], dev["qlens"])
            float(s.sum())
        return (time.time() - t0) / iters * 1e3
    live_ms = _time(lambda *a: g._infer(g.variables, *a))
    art_ms = _time(served._calls[served.bs])
    print(f"steady-state B={BS}: live {live_ms:.2f} ms  artifact {art_ms:.2f} ms")

def _iou(a, b):
    ay1, ax1, ay2, ax2 = a
    by1, bx1, by2, bx2 = b
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    inter = ih * iw
    ua = (ay2 - ay1) * (ax2 - ax1) + (by2 - by1) * (bx2 - bx1) - inter
    return inter / ua if ua > 0 else 0.0


worst_box = max(
    float(np.max(np.abs(np.array(a["box_norm"]) - np.array(b["box_norm"]))))
    for a, b in zip(live, exported)
)
worst_score = max(abs(a["score"] - b["score"]) for a, b in zip(live, exported))
worst_iou = min(_iou(a["box_norm"], b["box_norm"]) for a, b in zip(live, exported))
print(f"max |Δbox_norm|={worst_box:.2e}  max |Δscore|={worst_score:.2e}  "
      f"min IoU={worst_iou:.4f}")
# The live jit (tuned scoped-VMEM compile) and the artifact's untuned
# compile are DIFFERENT schedules of the same bf16 program; observed
# deltas are 1-2 bf16 ulps on O(1) values (6e-3 box, 8e-3 score). The
# claim under test is same-anchor + bf16-close regression: a wrong
# export misses by O(1) box / near-zero IoU.
assert worst_box <= 2e-2 and worst_score <= 2e-2 and worst_iou >= 0.95, \
    "artifact != live Grounder"
print("OK — TPU StableHLO artifact reproduces the live serving path")

# Phase 2: int8 artifact — the calibration scales are baked as constants
# (frozen deployments never recalibrate). Live int8 calibrates on its
# first batch; the artifact must reproduce it. int8 rounding can flip
# round(x/scale) by one LSB across compiles, so the bar is IoU-grade on
# trained margins, not bitwise.
gq = Grounder(
    cfg, vocab, dict(variables), batch_size=32, quantize=True,
    bucket_sizes=(32,),
)
imgs32 = [rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8) for _ in range(32)]
queries32 = ["a man in a red shirt", "the dog by the blue car"] * 16
t0 = time.time()
live_q = gq.ground(imgs32, queries32)  # first batch calibrates
assert "quant" in gq.variables
print(f"live int8 Grounder (calibrate+compile+run): {time.time()-t0:.0f}s")
with tempfile.TemporaryDirectory() as td2:
    t0 = time.time()
    art_q = export_serving(gq, td2, platforms=("tpu",))
    served_q = ExportedGrounder.load(art_q)
    exported_q = served_q.ground(imgs32, queries32)
    print(f"int8 artifact export+load+serve: {time.time()-t0:.0f}s")
worst_iou_q = min(
    _iou(a["box_norm"], b["box_norm"]) for a, b in zip(live_q, exported_q)
)
worst_score_q = max(abs(a["score"] - b["score"]) for a, b in zip(live_q, exported_q))
print(f"int8: max |Δscore|={worst_score_q:.2e}  min IoU={worst_iou_q:.4f}")
assert worst_iou_q >= 0.9 and worst_score_q <= 5e-2, "int8 artifact != live int8"
print("OK — int8 TPU artifact (baked calibration) reproduces live int8 serving")


# Phase 3: artifact v3 (weights as arguments) — bucketed (8, BS) export
# on TPU. The claim pair: (a) v3 bucketed size ≈ one weights blob +
# small modules (v2 bakes the full weights into EVERY bucket module);
# (b) the loaded v3 artifact reproduces live on both buckets at
# live-grade steady-state latency (the weights pytree is device-resident
# after load — feeding it per call is free).
def _dir_mb(p):
    return sum(f.stat().st_size for f in pathlib.Path(p).iterdir()) / 1e6


buckets = (8, 32)
gb = Grounder(cfg, vocab, dict(variables), batch_size=32, bucket_sizes=buckets)
live3 = gb.ground(imgs, queries)  # 8 items → the 8-bucket (canvas head)
with tempfile.TemporaryDirectory() as td_v2, tempfile.TemporaryDirectory() as td_v3:
    t0 = time.time()
    art_v2 = export_serving(gb, td_v2, platforms=("tpu",), bucket_sizes=buckets)
    art_v3 = export_serving(
        gb, td_v3, platforms=("tpu",), bucket_sizes=buckets, weights_as_args=True,
        multiquery=True,
    )
    v2_mb, v3_mb = _dir_mb(art_v2), _dir_mb(art_v3)
    print(
        f"bucketed {buckets} export: v2 (baked) {v2_mb:.1f} MB, "
        f"v3 (weights-as-args, +multiquery modules) {v3_mb:.1f} MB  "
        f"({time.time()-t0:.0f}s)"
    )
    served3 = ExportedGrounder.load(art_v3)
    ex3 = served3.ground(imgs, queries)  # routes through the 8-bucket
    worst_iou3 = min(_iou(a["box_norm"], b["box_norm"]) for a, b in zip(live3, ex3))
    print(f"v3: min IoU vs live = {worst_iou3:.4f}")
    assert worst_iou3 >= 0.95, "v3 artifact != live Grounder"
    v3_ms = _time(lambda *a: served3._calls[8](served3.variables, *a))
    print(f"steady-state B=8 bucket: v3 artifact {v3_ms:.2f} ms")
    # v2 duplicates the full weights into both bucket modules; v3 keeps
    # ONE weights.npz + small modules — must be decisively smaller even
    # though it also carries the extra multiquery modules.
    assert v3_mb < 0.75 * v2_mb, f"v3 {v3_mb:.1f} MB not < 75% of v2 {v2_mb:.1f} MB"

    # Phase 4: shared-backbone multiquery FROM the artifact. 5 phrases ×
    # one image (the Flickr30k regime) must (a) equal the live
    # ground_image answers, (b) beat the artifact's own per-pair call
    # in steady state — one backbone instead of five.
    q5 = (["a man in a red shirt", "the dog by the blue car"] * 3)[:5]
    live_mq = gb.ground_image(imgs[0], q5)
    art_mq = served3.ground_image(imgs[0], q5)
    worst_iou_mq = min(
        _iou(a["box_norm"], b["box_norm"]) for a, b in zip(live_mq, art_mq)
    )
    print(f"multiquery artifact: min IoU vs live ground_image = {worst_iou_mq:.4f}")
    assert worst_iou_mq >= 0.95, "multiquery artifact != live ground_image"
    enc5 = [vocab.encode(q, cfg.max_qlen) for q in q5] + [vocab.encode("x", cfg.max_qlen)] * 3
    img1 = jax.numpy.asarray(np.stack([imgs[0]]))
    qv5 = jax.numpy.asarray(np.stack([ids for ids, _ in enc5]).astype(np.int32))
    ql5 = jax.numpy.asarray(np.array([n for _, n in enc5], np.int32))
    img8 = jax.numpy.asarray(np.stack([imgs[0]] * 8))

    def _time_args(fn, args, iters=30):
        fn(*args)  # warm/compile
        t0 = time.time()
        for _ in range(iters):
            _, s = fn(*args)
            float(s.sum())
        return (time.time() - t0) / iters * 1e3

    mq_ms = _time_args(
        lambda *a: served3._mq_calls[8](served3.variables, *a), (img1, qv5, ql5)
    )
    pp_ms = _time_args(
        lambda *a: served3._calls[8](served3.variables, *a), (img8, qv5, ql5)
    )
    print(
        f"steady-state 5-query bucket-8: multiquery {mq_ms:.2f} ms  "
        f"per-pair {pp_ms:.2f} ms  ({pp_ms / mq_ms:.2f}x)"
    )
print(
    "OK — v3 weights-as-args TPU artifact: shared blob, live-equal, "
    "live-fast, shared-backbone multiquery"
)

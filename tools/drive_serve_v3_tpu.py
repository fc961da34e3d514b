"""Drive the ROUND-4 serving surface on the real TPU (VERDICT r4 next #6).

tools/drive_serve_tpu.py measures the live-checkpoint daemon; this one
measures the pieces round 4 added, end to end on the chip:

  1. a BUCKETED v3 artifact (weights-as-arguments + multiquery modules)
     exported for the TPU and served through ExportedGrounder;
  2. the daemon's ``{"queries": [...]}`` multiquery form against that
     artifact (shared-backbone pass from StableHLO);
  3. an overload burst against a bounded admission queue (--max_queue),
     recording how many requests shed with 503 and how fast.

Transport caveat (same as drive_serve_tpu.py): this dev box reaches the
chip over a tunnel (~50 ms/invocation), so daemon latencies are
transport-bound, not chip-bound — the numbers validate the artifact
serving path under real concurrency, not the chip's ceiling.

Usage: timeout 3000 python tools/drive_serve_v3_tpu.py [batch_size]
"""
import json
import pathlib
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

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
from zsgnet_tpu.serve import make_server

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

cfg = get_default_cfg().replace(bs=BS, do_dist=False)
vocab = Vocab.build(["a man in a red shirt", "the dog by the blue car door"])
model = get_default_net(cfg, vocab_size=len(vocab))
h, w = cfg.resize_img
init_batch = {
    "img": np.zeros((BS, h, w, 3), np.uint8),
    "qvec": np.ones((BS, cfg.max_qlen), np.int32),
    "qlens": np.full((BS,), 4, np.int32),
}
t0 = time.time()
variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
    jax.random.PRNGKey(0), init_batch
)
g = Grounder(cfg, vocab, variables, batch_size=BS, bucket_sizes=(1, BS))
print(f"init: {time.time()-t0:.0f}s", flush=True)

# --- 1. export the v3 bucketed multiquery artifact for the TPU ---
tmp = pathlib.Path(tempfile.mkdtemp(prefix="v3_drive_"))
t0 = time.time()
art = export_serving(
    g, tmp / "art", platforms=("tpu",), bucket_sizes=(1, BS),
    weights_as_args=True, multiquery=True,
)
sizes = {p.name: p.stat().st_size for p in art.glob("*")}
mod_mb = sum(v for k, v in sizes.items() if k.endswith(".stablehlo")) / 1e6
w_mb = sizes.get("weights.npz", 0) / 1e6
print(f"export: {time.time()-t0:.0f}s — modules {mod_mb:.1f} MB + "
      f"weights.npz {w_mb:.1f} MB "
      f"({sorted(k for k in sizes if k.endswith('.stablehlo'))})", flush=True)

eg = ExportedGrounder.load(art)
rng = np.random.default_rng(0)
img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

t0 = time.time()
eg.warmup()
print(f"artifact warmup (compile {2 + 2} modules): {time.time()-t0:.0f}s",
      flush=True)

# Artifact == live equality on the chip (drift check).
live = g.ground([img], ["a man in a red shirt"])
aot = eg.ground([img], ["a man in a red shirt"])
d = float(np.abs(np.asarray(live[0]["box_norm"]) - np.asarray(aot[0]["box_norm"])).max())
print(f"live-vs-artifact drift: dbox {d:.2e}, "
      f"dscore {abs(live[0]['score'] - aot[0]['score']):.2e}", flush=True)

# --- 2. daemon on the artifact: single + multiquery form latencies ---
srv = make_server(eg, port=0, window_ms=5.0, max_queue=4)
threading.Thread(target=srv.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{srv.server_address[1]}"

from PIL import Image

img_path = tmp / "q.jpg"
Image.fromarray(img).save(img_path, quality=90)


def _post(payload: dict, timeout=600):
    req = urllib.request.Request(
        url + "/ground", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


single = {"query": "a man in a red shirt", "image_path": str(img_path)}
Q5 = ["a man", "a red shirt", "the dog", "the blue car", "a man in a red shirt"]
mq = {"queries": Q5, "image_path": str(img_path)}

_post(single)  # route warm
t0 = time.time()
N = 20
for _ in range(N):
    code, _ = _post(single)
    assert code == 200
lat = (time.time() - t0) / N * 1e3
print(f"daemon single-request latency (v3 artifact): {lat:.1f} ms", flush=True)

code, out = _post(mq)
if code != 200:
    print("mq warm call failed:", code, out, flush=True)
t0 = time.time()
for _ in range(N):
    code, out = _post(mq)
    assert code == 200 and len(out["results"]) == 5, (code, out)
mq_lat = (time.time() - t0) / N * 1e3
print(f"daemon multiquery (Q=5) latency: {mq_lat:.1f} ms "
      f"({mq_lat/5:.1f} ms/pair, {5*lat/mq_lat:.2f}x vs 5 singles)", flush=True)

# --- 3. overload burst vs the bounded queue ---
counts = {"ok": 0, "shed": 0}
lock = threading.Lock()
lat_shed = []


def burst_client(_):
    t0 = time.time()
    code, _ = _post(single, timeout=120)
    dt = (time.time() - t0) * 1e3
    with lock:
        if code == 200:
            counts["ok"] += 1
        else:
            counts["shed"] += 1
            lat_shed.append(dt)


threads = [threading.Thread(target=burst_client, args=(k,)) for k in range(64)]
t0 = time.time()
for t in threads:
    t.start()
for t in threads:
    t.join(180)
burst_s = time.time() - t0
with urllib.request.urlopen(url + "/statz", timeout=60) as r:
    stats = json.loads(r.read())
print(f"overload burst: 64 clients in {burst_s:.1f}s — {counts['ok']} ok, "
      f"{counts['shed']} shed"
      + (f" (503 median {np.median(lat_shed):.0f} ms)" if lat_shed else "")
      + f"; /statz queue_depth={stats['queue_depth']} shed={stats['shed']}",
      flush=True)
assert stats["queue_depth"] == 0
print("DONE")

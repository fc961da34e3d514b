"""Drive the serving daemon end-to-end on the real TPU.

CPU tests (tests/test_serve.py) prove routing, coalescing, and equality;
this measures the SYSTEM number: real HTTP clients → micro-batcher →
compiled 300² retina forward on the chip → JSON responses. Reported qps
includes everything a deployment pays — HTTP parse, host image decode +
resize (native C++ path), tunnel transfer, device step, box decode.

NOTE on absolutes: this dev box reaches the chip over a tunnel with
~50 ms per program invocation and ≈56 MB/s host→device, so the daemon
qps here is transport-bound, NOT chip-bound (device-loop serving is
4593 qps — BASELINE.md). The numbers still validate the daemon under
real concurrency and show how micro-batching amortizes the transport:
qps should scale ≈ batch_size / (RTT + prep) as concurrency rises.

Usage: timeout 1100 python tools/drive_serve_tpu.py [batch_size]
"""
import io
import json
import pathlib
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

print("devices:", jax.devices())
assert jax.default_backend() == "tpu", "this drive needs the real chip"

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder
from zsgnet_tpu.serve import make_server

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 32

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
g = Grounder(cfg, vocab, variables, batch_size=BS)
print(f"init: {time.time()-t0:.0f}s")

rng = np.random.default_rng(0)
tmp = tempfile.mkdtemp(prefix="serve_drive_")
paths = []
try:
    from PIL import Image
except ImportError:
    Image = None
for i in range(16):
    arr = rng.integers(0, 255, size=(480, 640, 3)).astype(np.uint8)
    p = pathlib.Path(tmp) / f"img{i}.jpg"
    Image.fromarray(arr).save(p, quality=90)
    paths.append(str(p))

srv = make_server(g, port=0, window_ms=10.0)
threading.Thread(target=srv.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{srv.server_address[1]}"


def _post(payload: dict) -> dict:
    req = urllib.request.Request(
        url + "/ground", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
    print("healthz:", json.loads(r.read()))

# Warm the compile with one request (first device batch is the cold jit).
t0 = time.time()
out = _post({"query": "a man in a red shirt", "image_path": paths[0]})
assert "box_xyxy" in out and np.isfinite(out["score"])
print(f"first request (compile): {time.time()-t0:.0f}s")

# Warm every shape bucket up front — each is its own cold compile over the
# tunnel, and a mid-measurement compile would masquerade as a latency cliff.
for b in g.bucket_sizes:
    t0 = time.time()
    g.ground((paths * 4)[:b], ["warm up this bucket"] * b)
    print(f"bucket {b:3d} warm: {time.time()-t0:.0f}s", flush=True)

# Single-client latency (sequential, batches of 1 — the latency floor).
t0 = time.time()
N_LAT = 20
for i in range(N_LAT):
    _post({"query": "the dog by the blue car", "image_path": paths[i % 16]})
lat_ms = (time.time() - t0) / N_LAT * 1e3
print(f"single-client latency: {lat_ms:.1f} ms/request")

# Multi-query form: 5 phrases × one image — ONE HTTP round trip and ONE
# shared-backbone device pass (Grounder.ground_image) vs 5 single
# requests. The Flickr30k serving regime (~5 phrases/image).
Q5 = ["a man", "a red shirt", "the dog", "the blue car", "a man in a red shirt"]
out = _post({"queries": Q5, "image_path": paths[0]})  # warm the (1,q) bucket
assert isinstance(out, list) and len(out) == 5
t0 = time.time()
for i in range(N_LAT):
    _post({"queries": Q5, "image_path": paths[i % 16]})
mq_ms = (time.time() - t0) / N_LAT * 1e3
print(
    f"multi-query latency: {mq_ms:.1f} ms for 5 phrases "
    f"({mq_ms / 5:.1f} ms/pair vs {lat_ms:.1f} single — "
    f"{5 * lat_ms / mq_ms:.2f}x)"
)

# Concurrent throughput: enough client threads to fill device batches.
def run_load(n_clients: int, reqs_each: int) -> float:
    errs = []
    def client(k):
        for j in range(reqs_each):
            try:
                _post({"query": "a man in a red shirt",
                       "image_path": paths[(k + j) % 16]})
            except Exception as e:  # noqa: BLE001 — count, don't die
                errs.append(repr(e))
    threads = [threading.Thread(target=client, args=(k,)) for k in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    assert not errs, errs[:3]
    return n_clients * reqs_each / dt


for n_clients in (8, 2 * BS):
    qps = run_load(n_clients, max(4, 256 // n_clients))
    print(f"throughput @ {n_clients} concurrent clients: {qps:.0f} qps")

srv.shutdown()
print("OK — daemon served concurrent HTTP load on the chip")

# Phase 2: bucketed AOT artifact behind the same daemon. Exports one
# StableHLO module per bucket (weights baked into each), serves it via
# load_server_model's auto-detect, and measures the same single-client
# latency loop — the artifact path should keep the bucketing win.
from zsgnet_tpu.export import export_serving
from zsgnet_tpu.serve import load_server_model

art_dir = pathlib.Path(tmp) / "artifact"
t0 = time.time()
export_serving(g, art_dir, platforms=("tpu",), bucket_sizes=(1, BS),
               multiquery=True)
n_mb = sum(p.stat().st_size for p in art_dir.glob("serving_*.stablehlo")) / 1e6
print(f"bucketed (1,{BS}) artifact export: {time.time()-t0:.0f}s, {n_mb:.1f} MB")

served = load_server_model(art_dir)
assert served.bucket_sizes == (1, BS)
srv2 = make_server(served, port=0, window_ms=10.0)
threading.Thread(target=srv2.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{srv2.server_address[1]}"

t0 = time.time()
out = _post({"query": "a man in a red shirt", "image_path": paths[0]})
assert "box_xyxy" in out and np.isfinite(out["score"])
print(f"artifact first request (compile): {time.time()-t0:.0f}s")
served.ground((paths * 4)[:BS], ["warm the full bucket"] * BS)

t0 = time.time()
for i in range(N_LAT):
    _post({"query": "the dog by the blue car", "image_path": paths[i % 16]})
print(f"artifact single-client latency: {(time.time()-t0)/N_LAT*1e3:.1f} ms/request")

# The queries form now rides the artifact's shared-backbone multiquery
# modules (exported above) — one device pass for 5 phrases.
out = _post({"queries": Q5, "image_path": paths[0]})  # warm (1, q-bucket)
assert isinstance(out, list) and len(out) == 5
t0 = time.time()
for i in range(N_LAT):
    _post({"queries": Q5, "image_path": paths[i % 16]})
amq_ms = (time.time() - t0) / N_LAT * 1e3
print(
    f"artifact multi-query latency: {amq_ms:.1f} ms for 5 phrases "
    f"({amq_ms / 5:.1f} ms/pair)"
)
srv2.shutdown()
print("OK — bucketed artifact served over HTTP on the chip")

"""Measure the depth-2 host/device pipeline in Grounder.ground on chip.

``ground()`` defers the blocking result readback behind a 2-chunk window,
so chunk i+1's host prep (JPEG decode + resize + padding) overlaps chunk
i's host→device transfer + execution. This drive times one batched
``ground(N items)`` call (pipelined) against the same work issued one
chunk per call (each call ends with a sync — the pre-pipeline behavior),
on real JPEG paths so the host prep cost is the deployment one.

Usage: timeout 1100 python tools/drive_pipeline_tpu.py [batch_size] [n_chunks]
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
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_CHUNKS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

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
# Full-batch bucket only: this drive times the bs-sized chunk path.
g = Grounder(cfg, vocab, variables, batch_size=BS, bucket_sizes=(BS,))
print(f"init: {time.time()-t0:.0f}s")

from PIL import Image

rng = np.random.default_rng(0)
tmp = pathlib.Path(tempfile.mkdtemp(prefix="pipe_drive_"))
paths = []
for i in range(BS):
    arr = rng.integers(0, 255, size=(480, 640, 3)).astype(np.uint8)
    p = tmp / f"img{i}.jpg"
    Image.fromarray(arr).save(p, quality=90)
    paths.append(str(p))

n = BS * N_CHUNKS
all_paths = (paths * N_CHUNKS)[:n]
all_queries = ["a man in a red shirt"] * n

# Warm the compile + caches.
t0 = time.time()
g.ground(paths, ["warm"] * BS)
print(f"warm-up chunk (compile): {time.time()-t0:.0f}s")

for tag in ("pipelined", "per-chunk"):
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        if tag == "pipelined":
            res = g.ground(all_paths, all_queries)
        else:
            res = []
            for c in range(N_CHUNKS):
                res.extend(
                    g.ground(
                        all_paths[c * BS : (c + 1) * BS],
                        all_queries[c * BS : (c + 1) * BS],
                    )
                )
        dt = time.time() - t0
        assert len(res) == n and np.isfinite(res[0]["score"])
        best = min(best, dt)
    print(f"{tag}: {best*1e3:.0f} ms for {n} items → {n/best:.0f} qps")
print("OK — pipeline drive done")

"""Worker process for the 2-process jax.distributed multi-host test.

NOT a pytest module (underscore prefix — never collected). Launched by
tests/test_multihost.py as ``python _multihost_worker.py <port> <pid>
<data_dir> <out_dir>``: joins a 2-process CPU cluster (2 local devices
each → 4 global), runs ONE Learner train step + a full validate() through
the real multi-host branches (``make_array_from_process_local_data``
batch assembly, ``process_allgather`` eval gather), and writes the
metrics from rank 0 for the parent to compare against a single-process
run of the same global batch.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

port, pid, data_dir, out_dir = sys.argv[1:5]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=int(pid)
)
assert jax.device_count() == 4 and jax.local_device_count() == 2

from zsgnet_tpu.config import Config  # noqa: E402
from zsgnet_tpu.data.dataset import get_data  # noqa: E402
from zsgnet_tpu.train.learner import Learner  # noqa: E402

cfg = Config(
    ds_to_use="synthetic", data_dir=data_dir, bs=8, nw=1, lr=2e-3,
    resize_img=(64, 64), max_qlen=8, lstm_dim=16, emb_dim=16,
    fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
    do_dist=True, tmp_path=os.path.join(out_dir, f"tmp{pid}"), seed=3,
    opt_to_use="sgd",
)
data = get_data(cfg, shard_id=jax.process_index(), num_shards=jax.process_count())
learn = Learner("mh", data, cfg)

batch = next(iter(data.train_dl))
learn.state, ls = learn.train_step(learn.state, learn._shard(learn._device_view(batch)))
train_loss = float(ls["total"])
metrics = learn.validate()

if jax.process_index() == 0:
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump({"train_loss": train_loss, **metrics}, f)
print(f"worker {pid}: done train_loss={train_loss:.6f}", flush=True)

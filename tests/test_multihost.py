"""Multi-HOST correctness: 2 jax.distributed CPU processes vs 1 process.

VERDICT r1 #4: the only §2.11 branches without coverage were the
multi-process ones — ``Learner._shard``'s
``make_array_from_process_local_data`` global-batch assembly and
``_run_eval``'s ``process_allgather`` metric gather. This test launches a
real 2-process ``jax.distributed`` cluster (2 CPU devices per process,
4 global) via subprocesses, runs one train step + one full validate(),
and asserts the rank-0 metrics equal a single-process run on the SAME
global batch (the loss/grad math is global-normalized, so device/process
count must not change results).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.train.learner import Learner


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    root = tmp_path / "data"
    synthetic.generate(root, n_train=16, n_val=8, n_test=8, img_size=64)

    # --- 2-process cluster (subprocesses; this process keeps its 8-dev CPU) ---
    port = _free_port()
    out_dir = tmp_path / "mh"
    out_dir.mkdir()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    worker = Path(__file__).parent / "_multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i), str(root), str(out_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
            cwd=str(Path(__file__).parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    mh = json.loads((out_dir / "metrics.json").read_text())

    # --- single-process reference on the same global batch ---
    cfg = Config(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=1, lr=2e-3,
        resize_img=(64, 64), max_qlen=8, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
        do_dist=True, tmp_path=str(tmp_path / "tmp_single"), seed=3,
        opt_to_use="sgd",
    )
    data = get_data(cfg)  # shard 0/1 → the full global batch
    learn = Learner("mh_single", data, cfg)
    batch = next(iter(data.train_dl))
    learn.state, ls = learn.train_step(
        learn.state, learn._shard(learn._device_view(batch))
    )
    single = {"train_loss": float(ls["total"]), **learn.validate()}

    # Same init (seeded), same global batch, global-normalized loss →
    # process count must be invisible. fp32 reduction-order wiggle only.
    np.testing.assert_allclose(mh["train_loss"], single["train_loss"], rtol=2e-4)
    for k in ("Acc", "MaxPos", "num_samples"):
        np.testing.assert_allclose(mh[k], single[k], atol=1e-6, err_msg=k)
    np.testing.assert_allclose(mh["MeanIoU"], single["MeanIoU"], atol=1e-4)
    np.testing.assert_allclose(mh["loss"], single["loss"], rtol=2e-4)

"""Overfit-one-batch to high accuracy on the real TPU.

The strongest whole-loop correctness signal (SURVEY.md §4: "can the model
drive loss to ~0 on one batch"): if matching, loss, gradients, optimizer
and decode are all wired correctly, a few hundred steps on one fixed
batch must push top-anchor decode accuracy toward 1.0 on that batch.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse
import tempfile
import time

import numpy as np
import jax

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.models.zsgnet import anchor_components_for
from zsgnet_tpu.ops.level_ops import eval_batch_levels
from zsgnet_tpu.train.learner import Learner

ap = argparse.ArgumentParser()
ap.add_argument("--mdl_to_use", default="retina", choices=["retina", "ssd_vgg"])
args = ap.parse_args()

root = tempfile.mkdtemp(prefix="zsg_overfit_")
synthetic.generate(root, n_train=8, n_val=8, n_test=8, img_size=128)
cfg = get_default_cfg().replace(
    ds_to_use="synthetic", data_dir=root, bs=8, nw=2, lr=1e-3,
    resize_img=(128, 128), max_qlen=8, lstm_dim=32, emb_dim=32,
    do_dist=False, tmp_path=root + "/tmp", use_packed_cache=True,
    mdl_to_use=args.mdl_to_use,
)
print(f"mdl_to_use={cfg.mdl_to_use}")
data = get_data(cfg)
learn = Learner("overfit", data, cfg)
batch = next(iter(data.train_dl))
sharded = learn._shard(learn._device_view(batch, train=True))
comps = anchor_components_for(cfg)


@jax.jit
def acc_on_batch(state, b):
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        {k: b[k] for k in ("img", "qvec", "qlens")}, train=False,
    )
    ev = eval_batch_levels(out, comps, b["annot"], cfg.acc_iou_threshold)
    return ev["correct"].mean(), ev["iou"].mean()


t0 = time.time()
for step_i in range(401):
    learn.state, ls = learn.train_step(learn.state, sharded)
    if step_i % 100 == 0:
        acc, miou = acc_on_batch(learn.state, sharded)
        print(
            f"step {step_i:4d}  loss={float(ls['total']):7.4f}  "
            f"batch Acc={float(acc):.3f}  meanIoU={float(miou):.3f}"
        )
acc, miou = acc_on_batch(learn.state, sharded)
print(f"final: Acc={float(acc):.3f} meanIoU={float(miou):.3f}  wall={time.time()-t0:.0f}s")
assert float(acc) >= 0.75, "model failed to overfit one batch — learning loop broken?"
print("OK")

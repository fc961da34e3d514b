"""Dataset-scale end-to-end drive on the real TPU.

The missing system test between "overfit one batch" and "real ReferIt":
generate a few THOUSAND synthetic grounding pairs (JPEG — the native
libjpeg decode path real datasets hit), then run the full production
stack exactly as a user would: CSV loader → vocab build → native decode +
packed uint8 cache → Learner.fit (jitted SPMD step, shifted-BN prod
config) → per-epoch validate → best-checkpoint save → prediction dump →
Grounder serving from the saved checkpoint.

What it proves / measures:
  * the 1-core host can feed the chip at dataset scale (per-epoch
    end-to-end qps vs the 933–1016 qps pure-step ceiling);
  * val Acc actually rises on data the model must ground (color/shape
    words → region), not just memorize;
  * checkpoint → Grounder round trip works on the artifacts a real run
    leaves behind.

Usage: timeout 580 python tools/drive_dataset_tpu.py [--n=2048] [--epochs=4]
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import json
import shutil
import time
from pathlib import Path

ARGS = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a)
N = int(ARGS.get("n", 2048))
EPOCHS = int(ARGS.get("epochs", 4))
MDL = ARGS.get("mdl", "retina")
ROOT = Path(ARGS.get("root", "/tmp/zsg_dataset_drive"))

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.train.learner import Learner

if ROOT.exists():
    shutil.rmtree(ROOT)
t0 = time.time()
synthetic.generate(ROOT, n_train=N, n_val=256, n_test=256, img_size=400, fmt="jpg")
print(f"generated {N}+512 jpegs in {time.time()-t0:.1f}s", flush=True)

cfg = get_default_cfg().replace(
    ds_to_use="synthetic", data_dir=str(ROOT), bs=64, nw=2, epochs=EPOCHS,
    lr=1e-3, resize_img=(300, 300), bn_variance="shifted", mdl_to_use=MDL,
    use_packed_cache=True, do_dist=False, tmp_path=str(ROOT / "tmp"),
    log_every=10,
)
t0 = time.time()
data = get_data(cfg)
print(f"loader built (vocab={len(data.vocab)}) in {time.time()-t0:.1f}s", flush=True)

learn = Learner("ds_drive", data, cfg)
t0 = time.time()
learn.fit()
fit_s = time.time() - t0

rows = [json.loads(l) for l in open(learn.log_file)]
for r in rows:
    print(
        f"epoch {r['epoch']}: val_Acc={r['val_Acc']:.3f} val_MeanIoU={r.get('val_MeanIoU', 0):.3f} "
        f"train_loss={r['train_total']:.3f} epoch_qps={r['qps']:.0f}",
        flush=True,
    )
final = rows[-1]
test_metrics = learn.testing()
print(f"test: {json.dumps({k: round(v, 4) for k, v in test_metrics.items()})}", flush=True)

# Serving round trip from the checkpoint this run just wrote.
from zsgnet_tpu.predict import Grounder

vocab_path = ROOT / "tmp" / "vocab.json"
data.vocab.save(vocab_path)
g = Grounder.from_checkpoint(learn.model_dir, vocab_path, cfg, batch_size=4)
import pandas as pd

val_df = pd.read_csv(ROOT / "synthetic" / "csv_dir" / "val.csv").head(4)
imgs = [str(ROOT / "synthetic" / "images" / r.img_id) for r in val_df.itertuples()]
res = g.ground(imgs, [r.query for r in val_df.itertuples()])
correct = 0
for r, row in zip(res, val_df.itertuples()):
    bx = r["box_xyxy"]
    gt = (row.x1, row.y1, row.x2, row.y2)
    ix1, iy1 = max(bx[0], gt[0]), max(bx[1], gt[1])
    ix2, iy2 = min(bx[2], gt[2]), min(bx[3], gt[3])
    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
    a1 = (bx[2] - bx[0]) * (bx[3] - bx[1])
    a2 = (gt[2] - gt[0]) * (gt[3] - gt[1])
    iou = inter / max(a1 + a2 - inter, 1e-9)
    correct += iou > 0.5
print(f"Grounder on 4 val pairs from saved ckpt: {correct}/4 @IoU0.5", flush=True)

assert final["val_Acc"] > rows[0]["val_Acc"] or final["val_Acc"] > 0.5, "no learning signal"
print(
    json.dumps(
        {
            "n_train": N, "epochs": EPOCHS, "fit_wall_s": round(fit_s, 1),
            "final_val_Acc": final["val_Acc"], "test_Acc": test_metrics.get("Acc"),
            "last_epoch_qps": final["qps"],
        }
    ),
    flush=True,
)
print("OK")

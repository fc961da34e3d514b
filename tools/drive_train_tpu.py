"""Drive the full training surface on the real TPU: CLI → data → Learner.

Generates a synthetic grounding dataset on disk, then invokes the same
code path as ``python -m zsgnet_tpu.main`` (main_dist) with a small
config, training a few epochs and validating. Used by /verify — see
.claude/skills/verify/SKILL.md.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import tempfile
import time

import jax

from zsgnet_tpu.data import synthetic
from zsgnet_tpu.main import main_dist

print("devices:", jax.devices())
root = tempfile.mkdtemp(prefix="zsg_synth_")
synthetic.generate(root, n_train=64, n_val=16, n_test=16, img_size=128)
t0 = time.time()
metrics = main_dist(
    "drive_train",
    ds_to_use="synthetic",
    data_dir=root,
    bs=8,
    nw=4,
    epochs=3,
    lr="3e-4",
    resize_img="[128, 128]",
    max_qlen="8",
    lstm_dim="32",
    emb_dim="32",
    do_dist="False",       # one chip
    tmp_path=root + "/tmp",
    log_every="1",
)
print(f"train+val wall: {time.time()-t0:.1f}s")
print("final:", metrics)
assert metrics["num_samples"] == 16
assert metrics["MaxPos"] > 0.3, "decode path should find plausible anchors"
print("OK")

"""Grounder inference API: checkpoint → boxes in pixel coordinates."""

import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.predict import Grounder
from zsgnet_tpu.train.learner import Learner

# Whole-module slow: the fixture trains+checkpoints a Learner (~2 min
# of XLA:CPU compiles). Covered in the --runslow/nightly pass.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.generate(root, n_train=8, n_val=4, n_test=4, img_size=64)
    cfg = Config(
        ds_to_use="synthetic", data_dir=str(root), bs=4, nw=1, lr=1e-3,
        resize_img=(64, 64), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False, tmp_path=str(root / "tmp"), epochs=1, log_every=1,
    )
    data = get_data(cfg)
    learn = Learner("t_pred", data, cfg)
    learn.fit(1)
    return root, cfg, learn


def test_grounder_from_checkpoint(trained):
    root, cfg, learn = trained
    vocab_path = root / "synthetic" / "csv_dir" / "vocab.json"
    g = Grounder.from_checkpoint(learn.model_dir, vocab_path, cfg, batch_size=2)
    img = root / "synthetic" / "images" / "train_00000.png"
    res = g.ground([img, img, img], ["the red box", "the blue ellipse", "a thing"])
    assert len(res) == 3
    for r in res:
        x1, y1, x2, y2 = r["box_xyxy"]
        assert 0 <= r["score"] <= 1
        # pixel box within the original 64x64 frame, well-ordered
        assert -1 <= x1 <= 65 and -1 <= y1 <= 65
        assert x1 <= x2 and y1 <= y2


def test_grounder_array_input(trained, rng):
    root, cfg, learn = trained
    vocab_path = root / "synthetic" / "csv_dir" / "vocab.json"
    g = Grounder.from_checkpoint(learn.model_dir, vocab_path, cfg, batch_size=2)
    arr = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    (res,) = g.ground([arr], ["the red box"])
    assert "box_xyxy" in res
    with pytest.raises(ValueError, match="pre-resized"):
        g.ground([rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)], ["x"])


def test_export_from_checkpoint_e2e(trained, tmp_path):
    """ckpt dir → export_serving → ExportedGrounder ≡ live Grounder.

    The fast gate covers random-init export roundtrips
    (tests/test_export.py); this covers the full trained path: sidecar
    cfg/vocab auto-load, canvas serving head, CPU-platform lowering.
    """
    from zsgnet_tpu.export import ExportedGrounder, export_serving

    root, cfg, learn = trained
    g = Grounder.from_checkpoint(learn.model_dir, batch_size=2)
    art = export_serving(g, tmp_path / "art", platforms=("cpu",))
    served = ExportedGrounder.load(art)
    img = root / "synthetic" / "images" / "train_00000.png"
    queries = ["the red box", "the blue ellipse", "a thing"]
    live = g.ground([img] * 3, queries)
    exported = served.ground([img] * 3, queries)
    for a, b in zip(live, exported):
        np.testing.assert_allclose(a["box_xyxy"], b["box_xyxy"], atol=1e-4)
        assert abs(a["score"] - b["score"]) < 1e-6


def test_grounder_empty_and_mismatch(trained):
    root, cfg, learn = trained
    vocab_path = root / "synthetic" / "csv_dir" / "vocab.json"
    g = Grounder.from_checkpoint(learn.model_dir, vocab_path, cfg, batch_size=2)
    assert g.ground([], []) == []
    with pytest.raises(ValueError, match="pair up"):
        g.ground([], ["query"])

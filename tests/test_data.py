"""Data pipeline tests: vocab, CSV dataset, loader determinism/sharding."""

import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import BatchLoader, ImgQuDataset, get_data, normalize_box_xyxy
from zsgnet_tpu.data.vocab import PAD_ID, UNK_ID, Vocab


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.generate(root, n_train=24, n_val=10, n_test=6, img_size=64)
    return root


def cfg_for(root, **kw):
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=4, nw=2,
        resize_img=(64, 64), max_qlen=8, do_dist=False,
    )
    base.update(kw)
    return Config(**base)


def test_vocab_roundtrip(tmp_path):
    v = Vocab.build(["the red box", "the blue ellipse"])
    ids, ln = v.encode("the red box", max_len=6)
    assert ln == 3 and len(ids) == 6 and ids[3:] == [PAD_ID] * 3
    ids2, _ = v.encode("the chartreuse box", max_len=6)
    assert ids2[1] == UNK_ID  # unseen word
    v.save(tmp_path / "v.json")
    v2 = Vocab.load(tmp_path / "v.json")
    assert v2.word_to_id == v.word_to_id


def test_vocab_empty_query():
    v = Vocab.build(["a b"])
    ids, ln = v.encode("", max_len=4)
    assert ln == 1 and ids[0] == UNK_ID


def test_normalize_box():
    out = normalize_box_xyxy(np.array([0, 0, 100, 50], dtype=np.float32), (50, 100))
    np.testing.assert_allclose(out, [-1, -1, 1, 1], atol=1e-6)
    out = normalize_box_xyxy(np.array([25, 0, 75, 50], dtype=np.float32), (50, 100))
    np.testing.assert_allclose(out, [-1, -0.5, 1, 0.5], atol=1e-6)


def test_dataset_sample_shapes(synth_root):
    cfg = cfg_for(synth_root)
    data = get_data(cfg)
    s = data.train_dl.ds[0]
    assert s["img"].shape == (64, 64, 3) and s["img"].dtype == np.float32
    assert s["qvec"].shape == (8,)
    assert s["annot"].shape == (4,)
    assert -1 <= s["annot"].min() and s["annot"].max() <= 1
    # gt box top-left < bottom-right in (y1,x1,y2,x2)
    assert s["annot"][0] < s["annot"][2] and s["annot"][1] < s["annot"][3]


def test_loader_determinism_and_epochs(synth_root):
    cfg = cfg_for(synth_root)
    data = get_data(cfg)
    dl = data.train_dl
    dl.set_epoch(0)
    b1 = [b["idxs"].tolist() for b in dl]
    dl.set_epoch(0)
    b2 = [b["idxs"].tolist() for b in dl]
    assert b1 == b2, "same epoch must give identical order"
    dl.set_epoch(1)
    b3 = [b["idxs"].tolist() for b in dl]
    assert b1 != b3, "different epoch must reshuffle"
    assert len(b1) == 24 // 4


def test_loader_tail_padding_mask(synth_root):
    cfg = cfg_for(synth_root)
    data = get_data(cfg)
    dl = data.valid_dl  # 10 samples, bs 4, drop_last=False → 3 batches
    batches = list(dl)
    assert len(batches) == 3
    assert all(b["img"].shape == (4, 64, 64, 3) for b in batches)
    valid_total = sum(b["valid"].sum() for b in batches)
    assert valid_total == 10


def test_loader_sharding_disjoint(synth_root):
    cfg = cfg_for(synth_root)
    data = get_data(cfg)
    ds = data.train_dl.ds
    shards = [
        BatchLoader(ds, 4, shuffle=True, seed=0, nw=1, shard_id=i, num_shards=2)
        for i in range(2)
    ]
    seen = []
    for dl in shards:
        dl.set_epoch(0)
        for b in dl:
            seen.extend(b["idxs"].tolist())
    assert len(seen) == len(set(seen)), "shards must be disjoint"
    assert len(seen) == 24


def test_get_data_unknown_ds(synth_root):
    with pytest.raises(ValueError, match="unknown ds_to_use"):
        get_data(cfg_for(synth_root, ds_to_use="nope"))

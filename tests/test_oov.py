"""Open-vocabulary support — the zero-shot mechanism, end to end.

ZSGNet's headline zero-shot splits (Flickr-Split-0 = UNSEEN query
words; SURVEY §2.12, §6) only work if unseen words carry distinct,
meaningful embeddings instead of collapsing onto the one trained
``<unk>`` row. Two pieces make that real here:

* ``cfg.vocab_splits="all"`` — the word dict ids val/test words too;
  their GloVe-initialized rows are provably untouched by training
  (Adam's update is exactly 0 when grad, m and v are all 0).
* ``Grounder(oov_slots=N, glove_path=…)`` — serving-time extension:
  pre-reserved embedding rows are assigned to novel words on first
  sight (GloVe row, else deterministic per-word init) with NO shape
  change and NO recompile.
"""

import numpy as np
import pytest

import jax

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder, _get_embedding


def _tiny_cfg(**kw):
    base = dict(
        resize_img=(64, 64), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False, bs=2,
    )
    base.update(kw)
    return Config(**base)


def _init_grounder(oov_slots=0, glove_path=None):
    cfg = _tiny_cfg()
    vocab = Vocab.build(["the red box on the left"])
    model = get_default_net(cfg, vocab_size=len(vocab))
    batch = {
        "img": np.zeros((1, 64, 64, 3), np.uint8),
        "qvec": np.ones((1, 8), np.int32),
        "qlens": np.full((1,), 2, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    return Grounder(
        cfg, vocab, variables, batch_size=1,
        oov_slots=oov_slots, glove_path=glove_path,
    )


ZERO = np.zeros((64, 64, 3), np.uint8)


def test_without_slots_unseen_words_collapse_onto_unk():
    g = _init_grounder(oov_slots=0)
    (r1,) = g.ground([ZERO], ["zorblax"])
    (r2,) = g.ground([ZERO], ["quuxify"])
    assert r1["score"] == r2["score"] and r1["box_norm"] == r2["box_norm"]


def test_oov_slots_give_unseen_words_distinct_deterministic_rows():
    g = _init_grounder(oov_slots=4)
    base_vocab = len(g.vocab)
    (r1,) = g.ground([ZERO], ["zorblax"])
    (r2,) = g.ground([ZERO], ["quuxify"])
    (r1b,) = g.ground([ZERO], ["zorblax"])
    assert len(g.vocab) == base_vocab + 2
    # distinct unseen words → distinct embeddings → distinct outputs
    assert (r1["score"], r1["box_norm"]) != (r2["score"], r2["box_norm"])
    # same word later → identical result (row assignment is sticky)
    assert r1b["score"] == r1["score"] and r1b["box_norm"] == r1["box_norm"]
    # the padded table leaf kept its shape — no recompile ever happened
    assert _get_embedding(g.variables).shape[0] == base_vocab + 4


def test_oov_glove_row_is_used_verbatim(tmp_path):
    vec = np.arange(1, 9, dtype=np.float32) / 10.0
    glove = tmp_path / "glove.txt"
    glove.write_text(
        "zorblax " + " ".join(f"{v:.1f}" for v in vec) + "\n"
        "other 9 9 9 9 9 9 9 9\n"
    )
    g = _init_grounder(oov_slots=2, glove_path=glove)
    g.ground([ZERO], ["zorblax"])
    idx = g.vocab.word_to_id["zorblax"]
    np.testing.assert_array_equal(g._emb_host[idx], vec)
    np.testing.assert_array_equal(
        np.asarray(_get_embedding(g.variables))[idx], vec
    )
    # word absent from the file → deterministic hashed init, not zeros
    g.ground([ZERO], ["quuxify"])
    row = g._emb_host[g.vocab.word_to_id["quuxify"]]
    assert np.abs(row).max() > 0


def test_oov_slot_exhaustion_falls_back_to_unk(capsys):
    g = _init_grounder(oov_slots=1)
    base_vocab = len(g.vocab)
    g.ground([ZERO], ["zorblax quuxify"])  # second word: slots full
    assert len(g.vocab) == base_vocab + 1
    assert "OOV slots" in capsys.readouterr().out
    (r_q,) = g.ground([ZERO], ["quuxify"])
    (r_u,) = g.ground([ZERO], ["gronkle"])
    # both fell back to <unk> → identical outputs
    assert r_q["score"] == r_u["score"] and r_q["box_norm"] == r_u["box_norm"]


def test_oov_rejects_prepadded_table():
    g = _init_grounder(oov_slots=2)
    with pytest.raises(ValueError, match="OOV slots"):
        Grounder(g.cfg, g.vocab, g.variables, batch_size=1, oov_slots=2)


@pytest.fixture(scope="module")
def split_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oov_data")
    synthetic.generate(root, n_train=8, n_val=4, n_test=4, img_size=64)
    # give val a query word that never occurs in train
    import pandas as pd

    csv_dir = root / "synthetic" / "csv_dir"
    df = pd.read_csv(csv_dir / "val.csv")
    df.loc[0, "query"] = "zorblax " + str(df.loc[0, "query"])
    df.to_csv(csv_dir / "val.csv", index=False)
    return root


def test_vocab_splits_all_ids_val_only_words(split_root):
    cfg = _tiny_cfg(
        ds_to_use="synthetic", data_dir=str(split_root), nw=0,
    )
    data_train = get_data(cfg)
    assert "zorblax" not in data_train.vocab.word_to_id
    data_all = get_data(cfg.replace(vocab_splits="all"))
    assert "zorblax" in data_all.vocab.word_to_id
    # train-dict words keep existing in the bigger dict
    assert set(data_train.vocab.word_to_id) <= set(data_all.vocab.word_to_id)
    # the two dicts cache under different names (no shadowing); the
    # "all" cache keys on which split CSVs fed it (prepping a new split
    # later must rebuild, not silently reuse a dict missing its words)
    csv_dir = split_root / "synthetic" / "csv_dir"
    assert (csv_dir / "vocab.json").exists()
    assert list(csv_dir.glob("vocab_all_*train*.json"))


def test_missing_train_csv_raises_before_caching_vocab(tmp_path):
    """A partial data dir must never persist a near-empty word dict."""
    csv_dir = tmp_path / "synthetic" / "csv_dir"
    csv_dir.mkdir(parents=True)
    (csv_dir / "val.csv").write_text("img_id,query,x1,y1,x2,y2\na.png,hi,0,0,1,1\n")
    cfg = _tiny_cfg(ds_to_use="synthetic", data_dir=str(tmp_path), nw=0)
    with pytest.raises(FileNotFoundError, match="train.csv"):
        get_data(cfg)
    assert not list(csv_dir.glob("vocab*.json"))


def test_oov_ignores_tokens_past_max_qlen():
    """Tokens encode() truncates must not consume OOV slots."""
    g = _init_grounder(oov_slots=2)
    long_q = " ".join(["the"] * g.cfg.max_qlen) + " zorblax"
    g.ground([ZERO], [long_q])
    assert "zorblax" not in g.vocab.word_to_id


def test_training_never_touches_unseen_word_rows(split_root, tmp_path):
    """The zero-shot invariant: Adam's update is exactly 0 on rows whose
    grad/m/v are all 0, so a val-only word's (GloVe) row survives
    training bit-identically while trained-word rows move."""
    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for
    from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = _tiny_cfg(
        ds_to_use="synthetic", data_dir=str(split_root), nw=0,
        vocab_splits="all", tmp_path=str(tmp_path), lr=1e-2,
    )
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    emb0 = np.asarray(state.params["query_enc"]["embed"]["embedding"]).copy()

    anchors = anchor_pyramid_for(cfg)
    step = make_train_step(cfg, anchors, mesh=None)
    for _ in range(2):
        state, _ = step(state, dev)
    emb1 = np.asarray(state.params["query_enc"]["embed"]["embedding"])

    unseen = data.vocab.word_to_id["zorblax"]
    used = sorted({int(i) for i in np.asarray(batch["qvec"]).ravel() if i > 1})
    assert used, "train batch should reference real words"
    np.testing.assert_array_equal(emb1[unseen], emb0[unseen])
    assert np.abs(emb1[used[0]] - emb0[used[0]]).max() > 0

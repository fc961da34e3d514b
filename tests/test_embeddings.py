"""GloVe-format embedding initialization tests."""

import numpy as np

from zsgnet_tpu.data.embeddings import apply_embedding_init, load_embedding_table
from zsgnet_tpu.data.vocab import PAD_ID, UNK_ID, Vocab


def _glove_file(tmp_path, rows):
    p = tmp_path / "glove.txt"
    p.write_text("\n".join(f"{w} " + " ".join(str(v) for v in vec) for w, vec in rows))
    return p


def test_load_table_hits_and_oov(tmp_path):
    v = Vocab.build(["the red box", "a blue cat"])
    path = _glove_file(
        tmp_path,
        [("red", [1.0, 2.0, 3.0]), ("blue", [4.0, 5.0, 6.0]), ("zebra", [7.0, 8.0, 9.0])],
    )
    table, found = load_embedding_table(path, v, 3)
    assert found == 2
    np.testing.assert_allclose(table[v.word_to_id["red"]], [1, 2, 3])
    np.testing.assert_allclose(table[v.word_to_id["blue"]], [4, 5, 6])
    np.testing.assert_allclose(table[PAD_ID], 0.0)
    # OOV rows randomly initialized, not zero, deterministic by seed
    the_row = table[v.word_to_id["the"]]
    assert np.abs(the_row).sum() > 0
    table2, _ = load_embedding_table(path, v, 3)
    np.testing.assert_allclose(table, table2)


def test_word2vec_header_skipped(tmp_path):
    v = Vocab.build(["cat"])
    p = tmp_path / "w2v.txt"
    p.write_text("2 3\ncat 1.0 2.0 3.0\n")
    table, found = load_embedding_table(p, v, 3)
    assert found == 1
    np.testing.assert_allclose(table[v.word_to_id["cat"]], [1, 2, 3])


def test_apply_embedding_init():
    import jax.numpy as jnp

    params = {"query_enc": {"embed": {"embedding": jnp.zeros((4, 3))}}, "other": 1}
    table = np.arange(12, dtype=np.float32).reshape(4, 3)
    new = apply_embedding_init(params, table)
    np.testing.assert_allclose(np.asarray(new["query_enc"]["embed"]["embedding"]), table)
    assert new["other"] == 1
    # original untouched
    np.testing.assert_allclose(np.asarray(params["query_enc"]["embed"]["embedding"]), 0.0)

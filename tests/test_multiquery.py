"""Shared-backbone multi-query serving: ground_image ≡ per-pair ground.

`Grounder.ground_image` runs the backbone ONCE for N queries against one
image. Exactness rests on the decomposed fusion head's broadcasting
(models/zsgnet.py PredictionHead: batch-1 visual stream + batch-N
language stream), so every path — canvas head, per-level head, SSD
per-scale heads — must match the per-pair result on the same pairs.
"""

import jax
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder

QUERIES = [
    "the red box",
    "a blue ellipse on the left",
    "the left thing",
    "red box",
    "a blue box",
]


def _grounder(batch_size=4, bucket_sizes=None, **cfg_kw):
    base = dict(
        resize_img=(64, 64), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False,
    )
    base.update(cfg_kw)
    cfg = Config(**base)
    vocab = Vocab.build(QUERIES)
    model = get_default_net(cfg, vocab_size=len(vocab))
    h, w = cfg.resize_img
    batch = {
        "img": np.zeros((2, h, w, 3), np.uint8),
        "qvec": np.ones((2, cfg.max_qlen), np.int32),
        "qlens": np.full((2,), 3, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    return Grounder(cfg, vocab, variables, batch_size, bucket_sizes=bucket_sizes)


def _image(rng, hw=(64, 64)):
    return rng.integers(0, 255, size=(*hw, 3)).astype(np.uint8)


def _assert_matches(multi, per_pair):
    assert len(multi) == len(per_pair)
    for m, p in zip(multi, per_pair):
        np.testing.assert_allclose(m["box_norm"], p["box_norm"], atol=1e-4)
        np.testing.assert_allclose(m["box_xyxy"], p["box_xyxy"], atol=1e-2)
        assert abs(m["score"] - p["score"]) < 1e-5


def test_multiquery_matches_per_pair_canvas(rng):
    # batch_size ≤ 16 → the Grounder serves through the canvas head.
    g = _grounder(batch_size=4)
    img = _image(rng)
    # N=5 > bs=4 also exercises the chunking loop (two backbone passes).
    multi = g.ground_image(img, QUERIES)
    per_pair = g.ground([img] * len(QUERIES), QUERIES)
    _assert_matches(multi, per_pair)


def test_multiquery_matches_per_pair_level_head(rng):
    # A single large bucket keeps the per-level head for every call.
    g = _grounder(batch_size=32, bucket_sizes=(32,))
    assert g._infer_latency is None
    img = _image(rng)
    _assert_matches(
        g.ground_image(img, QUERIES), g.ground([img] * len(QUERIES), QUERIES)
    )


def test_multiquery_matches_per_pair_ssd(rng):
    # SSD's native per-scale channel heads take the per-level path even
    # at latency batches (same_ch is False).
    g = _grounder(batch_size=4, mdl_to_use="ssd_vgg", resize_img=(96, 96))
    img = _image(rng, (96, 96))
    qs = QUERIES[:3]
    _assert_matches(g.ground_image(img, qs), g.ground([img] * len(qs), qs))


def test_multiquery_empty_and_path_input(rng, tmp_path):
    from PIL import Image

    g = _grounder(batch_size=4)
    assert g.ground_image(_image(rng), []) == []
    # Path input: original-pixel coordinates rescale to the source frame.
    arr = rng.integers(0, 255, size=(48, 80, 3)).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    multi = g.ground_image(p, QUERIES[:2])
    per_pair = g.ground([p, p], QUERIES[:2])
    _assert_matches(multi, per_pair)
    with pytest.raises(ValueError, match="pre-resized"):
        g.ground_image(rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8), ["x"])


def test_multiquery_mesh_grounder_falls_back(rng):
    # Mesh Grounders serve multi-query per-pair (batch-1 images can't
    # shard over the data axis) — same results either way.
    from zsgnet_tpu.parallel.mesh import make_mesh

    cfg_kw = dict(batch_size=8, bucket_sizes=(8,))
    g1 = _grounder(**cfg_kw)
    mesh = make_mesh(g1.cfg, jax.devices())
    g2 = Grounder(
        g1.cfg, g1.vocab, g1.variables, 8, bucket_sizes=(8,), mesh=mesh
    )
    img = _image(rng)
    _assert_matches(
        g2.ground_image(img, QUERIES), g1.ground([img] * len(QUERIES), QUERIES)
    )


def test_warmup_multiquery_compiles(rng):
    g = _grounder(batch_size=2, bucket_sizes=(1, 2))
    g.warmup(multiquery=True)  # must not raise; compiles (1, b) programs
    res = g.ground_image(_image(rng), QUERIES[:2])
    assert len(res) == 2

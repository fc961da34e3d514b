"""AOT serving export: Grounder → StableHLO artifact → equal results.

The exported artifact must reproduce the live Grounder exactly — same
weights (baked as constants), same pre/postprocessing (shared helpers).
Runs in the fast gate: a tiny random-init model, no Learner/checkpoint.
"""

import json

import jax
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.export import ExportedGrounder, export_serving
from zsgnet_tpu.models.zsgnet import get_default_net
from zsgnet_tpu.predict import Grounder


@pytest.fixture(scope="module")
def tiny_grounder():
    cfg = Config(
        resize_img=(64, 64), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False, bs=2,
    )
    vocab = Vocab.build(["the red box", "a blue ellipse on the left"])
    model = get_default_net(cfg, vocab_size=len(vocab))
    rng = np.random.default_rng(0)
    batch = {
        "img": np.zeros((2, 64, 64, 3), np.uint8),
        "qvec": np.ones((2, 8), np.int32),
        "qlens": np.full((2,), 3, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    g = Grounder(cfg, vocab, variables, batch_size=2)
    imgs = [
        rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8) for _ in range(3)
    ]
    queries = ["the red box", "a blue ellipse", "box on the left"]
    return g, imgs, queries


def test_export_roundtrip_equals_live(tiny_grounder, tmp_path):
    g, imgs, queries = tiny_grounder
    out = export_serving(g, tmp_path / "art", platforms=("cpu",))
    assert (out / "serving_fn.stablehlo").stat().st_size > 0
    meta = json.loads((out / "export.json").read_text())
    assert meta["batch_size"] == 2 and meta["platforms"] == ["cpu"]

    served = ExportedGrounder.load(out)
    # 3 requests over batch_size=2 → exercises the padded tail chunk too.
    live = g.ground(imgs, queries)
    exported = served.ground(imgs, queries)
    assert len(live) == len(exported) == 3
    for a, b in zip(live, exported):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-6)
        np.testing.assert_allclose(a["box_xyxy"], b["box_xyxy"], atol=1e-4)
        assert abs(a["score"] - b["score"]) < 1e-6


def test_bucketed_export_roundtrip(tiny_grounder, tmp_path):
    """bucket_sizes= exports one module per bucket; the loaded artifact
    routes each chunk to the smallest fitting bucket (same routing as the
    live Grounder) and still matches it exactly."""
    g, imgs, queries = tiny_grounder
    out = export_serving(
        g, tmp_path / "artb", platforms=("cpu",), bucket_sizes=g.bucket_sizes
    )
    meta = json.loads((out / "export.json").read_text())
    assert meta["version"] == 2 and meta["bucket_sizes"] == [1, 2]
    assert (out / "serving_fn_b1.stablehlo").stat().st_size > 0
    assert (out / "serving_fn_b2.stablehlo").stat().st_size > 0
    assert not (out / "serving_fn.stablehlo").exists()

    served = ExportedGrounder.load(out)
    assert served.bucket_sizes == (1, 2)
    # 3 requests → one full B=2 chunk + one B=1 tail via the small bucket.
    live = g.ground(imgs, queries)
    exported = served.ground(imgs, queries)
    for a, b in zip(live, exported):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-6)
        assert abs(a["score"] - b["score"]) < 1e-6


def test_export_restores_cfg_and_vocab(tiny_grounder, tmp_path):
    g, _, _ = tiny_grounder
    out = export_serving(g, tmp_path / "art2", platforms=("cpu",))
    served = ExportedGrounder.load(out)
    assert served.cfg.resize_img == g.cfg.resize_img
    assert served.cfg.max_qlen == g.cfg.max_qlen
    assert len(served.vocab) == len(g.vocab)
    assert served.vocab.encode("the red box", 8) == g.vocab.encode("the red box", 8)


@pytest.mark.slow
def test_export_calibrated_int8_roundtrip(tiny_grounder, tmp_path):
    """A calibrated int8 Grounder exports with its activation scales baked
    in (the frozen deployment never recalibrates — export.py docstring).

    Unlike the fp32 roundtrip above, int8 cannot be bit-equal across
    compilations: the live jit and the AOT artifact fuse the pre-quantize
    ops differently, and any last-ulp input drift flips ``round(x/scale)``
    by one quantization level — which at RANDOM init can flip a near-tie
    argmax to a different anchor (observed on CPU: two samples Δbox
    ≈ 7e-4, one sample box flip). Assertions follow the convention of
    ``test_quant.test_full_model_int8_agrees_with_bf16_decode`` (top
    score close, boxes IoU-majority); the decisive-margin exact check
    runs on a TRAINED model in ``tools/drive_export_tpu.py``. A missing
    or garbage 'quant' collection misses by O(1) on every sample."""
    g, imgs, queries = tiny_grounder
    cfg = g.cfg.replace(head_canvas=False)
    gq = Grounder(cfg, g.vocab, dict(g.variables), batch_size=32, quantize=True)
    live = gq.ground(imgs, queries)  # first batch auto-calibrates
    assert "quant" in gq.variables
    out = export_serving(gq, tmp_path / "art_int8", platforms=("cpu",))
    assert json.loads((out / "export.json").read_text())["quantized"] is True

    served = ExportedGrounder.load(out)
    exported = served.ground(imgs, queries)
    ious = []
    for a, b in zip(live, exported):
        assert abs(a["score"] - b["score"]) < 5e-3  # max logit is flip-stable
        ay1, ax1, ay2, ax2 = a["box_norm"]
        by1, bx1, by2, bx2 = b["box_norm"]
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        inter = ih * iw
        union = (ay2 - ay1) * (ax2 - ax1) + (by2 - by1) * (bx2 - bx1) - inter
        ious.append(inter / union if union > 0 else 0.0)
    assert np.mean([i > 0.8 for i in ious]) >= 0.66, f"int8 artifact diverged: {ious}"


def test_weights_as_args_roundtrip_and_shared_blob(tiny_grounder, tmp_path):
    """Artifact v3 (VERDICT r3 missing #3): modules take the variables
    pytree as an input and ONE weights.npz is shared by every bucket —
    results still equal the live Grounder exactly, and each v3 module is
    smaller than its weight-baking v2 counterpart (the constants moved
    out)."""
    g, imgs, queries = tiny_grounder
    out2 = export_serving(
        g, tmp_path / "v2", platforms=("cpu",), bucket_sizes=g.bucket_sizes
    )
    out3 = export_serving(
        g, tmp_path / "v3", platforms=("cpu",), bucket_sizes=g.bucket_sizes,
        weights_as_args=True,
    )
    meta = json.loads((out3 / "export.json").read_text())
    assert meta["version"] == 3 and meta["weights_as_args"] is True
    assert (out3 / "weights.npz").stat().st_size > 0
    for b in meta["bucket_sizes"]:
        v2m = (out2 / f"serving_fn_b{b}.stablehlo").stat().st_size
        v3m = (out3 / f"serving_fn_b{b}.stablehlo").stat().st_size
        assert v3m < v2m, f"bucket {b}: v3 module {v3m} !< v2 {v2m}"

    served = ExportedGrounder.load(out3)
    live = g.ground(imgs, queries)
    exported = served.ground(imgs, queries)
    assert len(live) == len(exported) == 3
    for a, b in zip(live, exported):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-6)
        assert abs(a["score"] - b["score"]) < 1e-6


def test_weights_as_args_oov_serving(tmp_path):
    """Open-vocabulary serving FROM AN ARTIFACT — the capability baked
    weights could never offer (serve.py used to reject it): a v3 export
    of an oov Grounder keeps assigning embedding rows to unseen words at
    serving time, matching the live oov Grounder exactly (the no-GloVe
    init is deterministic per word), and giving unseen words answers
    distinct from the <unk> collapse."""
    cfg = Config(
        resize_img=(64, 64), max_qlen=8, lstm_dim=8, emb_dim=8,
        fpn_ch=16, head_ch=16, compute_dtype="float32", use_pallas=False,
        do_dist=False, bs=2,
    )
    vocab = Vocab.build(["the red box", "a blue ellipse on the left"])
    model = get_default_net(cfg, vocab_size=len(vocab))
    batch = {
        "img": np.zeros((2, 64, 64, 3), np.uint8),
        "qvec": np.ones((2, 8), np.int32),
        "qlens": np.full((2,), 3, np.int32),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    g = Grounder(cfg, Vocab(dict(vocab.word_to_id)), dict(variables),
                 batch_size=2, oov_slots=4)
    out = export_serving(g, tmp_path / "oov_art", platforms=("cpu",),
                         weights_as_args=True)
    served = ExportedGrounder.load(out)
    assert served.oov_slots == 4 and served._vocab_rows == len(vocab) + 4

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    base = len(served.vocab)
    r_art = served.ground([img, img], ["zebra", "the red box"])
    assert len(served.vocab) == base + 1  # 'zebra' got a slot
    r_live = g.ground([img, img], ["zebra", "the red box"])
    for a, b in zip(r_live, r_art):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-6)
        assert abs(a["score"] - b["score"]) < 1e-6
    # distinctness: the unseen word did NOT collapse onto <unk>
    r_unk = served.ground([img], ["<unk>"])
    assert (
        abs(r_art[0]["score"] - r_unk[0]["score"]) > 1e-9
        or not np.allclose(r_art[0]["box_norm"], r_unk[0]["box_norm"])
    )
    # exhaustion falls back to <unk> with a warning, never an error
    served.ground([img] * 4, ["aa", "bb", "cc", "dd"])
    assert len(served.vocab) == served._vocab_rows
    r_over = served.ground([img], ["qqqq"])
    np.testing.assert_allclose(r_over[0]["box_norm"], r_unk[0]["box_norm"], atol=1e-6)


@pytest.mark.slow  # Slow tier (r5): mq-artifact equality also covered by the fast
    # data-parallel artifact test in test_serve.py.
def test_multiquery_export_matches_live_ground_image(tiny_grounder, tmp_path):
    """multiquery=True exports shared-backbone (1 image × N queries)
    modules; the loaded artifact's ground_image runs ONE backbone pass per
    chunk and matches both the live ground_image and the per-pair path —
    so artifact-backed daemons serve the '"queries": [...]' form at the
    same cost as live daemons."""
    g, imgs, queries = tiny_grounder
    out = export_serving(
        g, tmp_path / "mq", platforms=("cpu",),
        bucket_sizes=g.bucket_sizes, multiquery=True,
    )
    meta = json.loads((out / "export.json").read_text())
    assert meta["multiquery_buckets"] == [1, 2]
    for b in (1, 2):
        assert (out / f"serving_mq_b{b}.stablehlo").stat().st_size > 0

    served = ExportedGrounder.load(out)
    assert sorted(served._mq_calls) == [1, 2]
    img = imgs[0]
    # 3 queries over bucket 2 → a full chunk + a tail chunk via bucket 1.
    art = served.ground_image(img, queries)
    live = g.ground_image(img, queries)
    assert len(art) == len(live) == 3
    for a, b in zip(live, art):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-6)
        assert abs(a["score"] - b["score"]) < 1e-6
    # and ≡ the artifact's own per-pair path (broadcast exactness)
    per_pair = served.ground([img] * 3, queries)
    for a, b in zip(per_pair, art):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-4)
        assert abs(a["score"] - b["score"]) < 1e-5


def test_ground_image_falls_back_without_mq_modules(tiny_grounder, tmp_path):
    """Artifacts exported WITHOUT multiquery still answer ground_image
    (per-pair fallback) — the daemon's hasattr dispatch never breaks on
    older artifacts."""
    g, imgs, queries = tiny_grounder
    out = export_serving(g, tmp_path / "nomq", platforms=("cpu",))
    served = ExportedGrounder.load(out)
    assert served._mq_calls == {}
    img = imgs[1]
    fallback = served.ground_image(img, queries)
    per_pair = served.ground([img] * 3, queries)
    for a, b in zip(per_pair, fallback):
        np.testing.assert_allclose(a["box_norm"], b["box_norm"], atol=1e-6)
        assert abs(a["score"] - b["score"]) < 1e-6


def test_export_rejects_uncalibrated_int8(tiny_grounder, tmp_path):
    g, _, _ = tiny_grounder
    # Rebuild as an int8 Grounder at a throughput batch size but skip
    # calibration: export must refuse (scales would be garbage constants).
    cfg = g.cfg.replace(head_canvas=False)
    gq = Grounder(cfg, g.vocab, dict(g.variables), batch_size=32, quantize=True)
    assert gq.quantize and "quant" not in gq.variables
    with pytest.raises(ValueError, match="uncalibrated"):
        export_serving(gq, tmp_path / "art3", platforms=("cpu",))


@pytest.mark.slow  # composition of three fast-tested pieces (int8 export,
# mq export, grouped-int8 equality); ~45 s of compile
def test_export_int8_multiquery_roundtrip(tiny_grounder, tmp_path):
    """int8 × multiquery × v3 export (r5 — the 47× serving frontier as
    a deployable artifact): a calibrated int8 Grounder exports mq
    modules too; artifact ground_image tracks the live quantized
    ground_image under the int8 flip-tolerance convention
    (test_export_calibrated_int8_roundtrip's bar)."""
    g, imgs, queries = tiny_grounder
    cfg = g.cfg.replace(head_canvas=False)
    gq = Grounder(cfg, g.vocab, dict(g.variables), batch_size=32, quantize=True)
    gq.ground(imgs, queries)  # calibrate
    out = export_serving(gq, tmp_path / "art_i8mq", platforms=("cpu",),
                         weights_as_args=True, multiquery=True)
    served = ExportedGrounder.load(out)
    assert served._mq_calls, "mq modules missing from int8 export"
    img = imgs[0]
    live = gq.ground_image(img, queries)
    art = served.ground_image(img, queries)
    ious = []
    for a, b in zip(live, art):
        assert abs(a["score"] - b["score"]) < 5e-3
        ay1, ax1, ay2, ax2 = a["box_norm"]
        by1, bx1, by2, bx2 = b["box_norm"]
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        inter = ih * iw
        union = (ay2 - ay1) * (ax2 - ax1) + (by2 - by1) * (bx2 - bx1) - inter
        ious.append(inter / union if union > 0 else 0.0)
    assert np.mean([i > 0.8 for i in ious]) >= 0.66, f"int8 mq artifact: {ious}"

"""FULL-model torch→flax checkpoint conversion parity (VERDICT r1 #1).

Builds a complete reference-shaped ZSGNet in pure torch — ResNet-50 +
FPN + embedding + packed BiLSTM + fusion head with per-anchor-interleaved
output channels — converts the entire state_dict through
``convert_zsgnet_checkpoint`` (backbone, FPN, LSTM, embed, decomposed
conv0, regrouped final projection), and asserts ``att_out``/``bbx_out``
equality at the reference's 300² input. This is the strongest available
accuracy-parity proxy while real datasets/checkpoints are absent
(SURVEY.md §7 "hard parts" 2–4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from test_convert import TorchResNet50  # noqa: E402
from zsgnet_tpu.config import Config  # noqa: E402
from zsgnet_tpu.convert.torch_import import (  # noqa: E402
    convert_fpn,
    convert_zsgnet_checkpoint,
)
from zsgnet_tpu.models.fpn import FPN, upsample_nearest_torch  # noqa: E402
from zsgnet_tpu.models.zsgnet import ZSGNet  # noqa: E402
from zsgnet_tpu.ops.anchors import create_grid  # noqa: E402


class TorchFPN(tnn.Module):
    """Reference-lineage FPN (kuangliu naming — convert.FPN_NAME_MAP),
    wired to mirror models/fpn.py exactly: merge top-down (nearest), then
    smooth; P6 from C5, P7 from relu(P6)."""

    def __init__(self, ch=256):
        super().__init__()
        self.latlayer1 = tnn.Conv2d(2048, ch, 1)
        self.latlayer2 = tnn.Conv2d(1024, ch, 1)
        self.latlayer3 = tnn.Conv2d(512, ch, 1)
        self.toplayer0 = tnn.Conv2d(ch, ch, 3, padding=1)
        self.toplayer1 = tnn.Conv2d(ch, ch, 3, padding=1)
        self.toplayer2 = tnn.Conv2d(ch, ch, 3, padding=1)
        self.conv6 = tnn.Conv2d(2048, ch, 3, stride=2, padding=1)
        self.conv7 = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, c3, c4, c5):
        p5 = self.latlayer1(c5)
        p4 = self.latlayer2(c4) + F.interpolate(p5, size=c4.shape[2:], mode="nearest")
        p3 = self.latlayer3(c3) + F.interpolate(p4, size=c3.shape[2:], mode="nearest")
        p3 = self.toplayer2(p3)
        p4 = self.toplayer1(p4)
        p5 = self.toplayer0(p5)
        p6 = self.conv6(c5)
        p7 = self.conv7(F.relu(p6))
        return [p3, p4, p5, p6, p7]


class TorchHead(tnn.Module):
    """4×(conv3×3+ReLU) + conv3×3 → A·5, per-anchor-interleaved channels
    [a0:(score,dy,dx,dh,dw), a1:(…), …] — the reference layout that
    ``regroup_head_kernel`` reorders."""

    def __init__(self, in_ch, mid, num_anchors):
        super().__init__()
        self.conv0 = tnn.Conv2d(in_ch, mid, 3, padding=1)
        self.conv1 = tnn.Conv2d(mid, mid, 3, padding=1)
        self.conv2 = tnn.Conv2d(mid, mid, 3, padding=1)
        self.conv3 = tnn.Conv2d(mid, mid, 3, padding=1)
        self.out = tnn.Conv2d(mid, num_anchors * 5, 3, padding=1)

    def forward(self, x):
        for c in (self.conv0, self.conv1, self.conv2, self.conv3):
            x = F.relu(c(x))
        return self.out(x)


class _Backbone(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.encoder = TorchResNet50()
        self.fpn = TorchFPN(ch)


class TorchZSGNet(tnn.Module):
    """Complete reference-shaped model (SURVEY.md §3.3 forward)."""

    def __init__(self, vocab, emb_dim, hidden, fpn_ch, head_ch, num_anchors):
        super().__init__()
        self.backbone = _Backbone(fpn_ch)
        self.embedding = tnn.Embedding(vocab, emb_dim)
        self.lstm = tnn.LSTM(emb_dim, hidden, bidirectional=True, batch_first=True)
        self.head = TorchHead(fpn_ch + 2 * hidden + 2, head_ch, num_anchors)
        self.num_anchors = num_anchors

    def forward(self, img, qvec, qlens):
        feats = self.backbone.fpn(*self.backbone.encoder(img))
        packed = tnn.utils.rnn.pack_padded_sequence(
            self.embedding(qvec), qlens, batch_first=True, enforce_sorted=False
        )
        _, (h_n, _) = self.lstm(packed)
        q = torch.cat([h_n[0], h_n[1]], dim=-1)  # (B, 2H), original order
        a = self.num_anchors
        atts, bbxs = [], []
        for f in feats:
            b, _, h, w = f.shape
            lang = q[:, :, None, None].expand(b, q.shape[1], h, w)
            grid = torch.tensor(
                create_grid((h, w), flatten=False).transpose(2, 0, 1)
            )[None].expand(b, 2, h, w)
            out = self.head(torch.cat([f, lang, grid], dim=1))  # (B, A*5, H, W)
            r = out.permute(0, 2, 3, 1).reshape(b, h * w * a, 5)
            atts.append(r[..., 0])
            bbxs.append(r[..., 1:5])
        return torch.cat(atts, 1), torch.cat(bbxs, 1)


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)


def test_upsample_matches_torch_nearest(rng):
    """Non-integer-ratio nearest upsample must pick torch's source pixels
    (10→19 is the real P5→P4 hop at 300²)."""
    x = rng.normal(size=(1, 10, 10, 7)).astype(np.float32)
    for out_hw in ((19, 19), (20, 20), (13, 17)):
        want = F.interpolate(
            torch.tensor(x.transpose(0, 3, 1, 2)), size=out_hw, mode="nearest"
        ).numpy()
        got = np.asarray(upsample_nearest_torch(jnp.asarray(x), out_hw))
        np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_fpn_conversion_parity(rng):
    """Converted torch FPN == flax FPN forward, incl. a non-integer
    top-down hop (4→7)."""
    tm = TorchFPN().eval()
    params = convert_fpn(tm.state_dict())
    assert set(params) == {
        "lat3", "lat4", "lat5", "smooth3", "smooth4", "smooth5", "p6", "p7"
    }
    c3 = rng.normal(size=(1, 13, 13, 512)).astype(np.float32)
    c4 = rng.normal(size=(1, 7, 7, 1024)).astype(np.float32)
    c5 = rng.normal(size=(1, 4, 4, 2048)).astype(np.float32)
    with torch.no_grad():
        want = tm(*(torch.tensor(c.transpose(0, 3, 1, 2)) for c in (c3, c4, c5)))
    got = FPN(dtype=jnp.float32).apply(
        {"params": params}, tuple(jnp.asarray(c) for c in (c3, c4, c5))
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=2e-4, rtol=1e-3
        )


def test_fpn_conversion_rejects_mismapped_names():
    tm = TorchFPN()
    with pytest.raises(ValueError, match="fix name_map"):
        convert_fpn(tm.state_dict(), name_map={"p6": "latlayer1"})


@pytest.mark.slow
def test_full_model_conversion_parity(rng):
    """The whole checkpoint — backbone+FPN+embed+BiLSTM+head (conv0
    decomposition + out regroup) — converts and matches torch logits at
    300²."""
    VOCAB, EMB, HID, FPN_CH, HEAD_CH, A = 30, 32, 32, 256, 64, 9
    tm = TorchZSGNet(VOCAB, EMB, HID, FPN_CH, HEAD_CH, A).eval()
    _randomize_bn(tm)

    converted = convert_zsgnet_checkpoint(
        tm.state_dict(),
        backbone_prefix="backbone.encoder.",
        fpn_prefix="backbone.fpn.",
        lstm_prefix="lstm.",
        embed_key="embedding.weight",
        head_conv_prefixes=(
            "head.conv0", "head.conv1", "head.conv2", "head.conv3", "head.out"
        ),
        num_anchors=A,
    )

    B, T = 2, 8
    img = rng.normal(size=(B, 300, 300, 3)).astype(np.float32)
    qvec = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    qlens = np.array([5, T], dtype=np.int32)
    with torch.no_grad():
        want_att, want_bbx = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)),
            torch.tensor(qvec.astype(np.int64)),
            torch.tensor(qlens),
        )

    cfg = Config(
        resize_img=(300, 300), emb_dim=EMB, lstm_dim=HID, fpn_ch=FPN_CH,
        head_ch=HEAD_CH, max_qlen=T, compute_dtype="float32", use_pallas=False,
    )
    model = ZSGNet(cfg=cfg, vocab_size=VOCAB)
    out = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        {"img": jnp.asarray(img), "qvec": jnp.asarray(qvec), "qlens": jnp.asarray(qlens)},
        train=False,
    )
    att, bbx = np.asarray(out["att_out"]), np.asarray(out["bbx_out"])
    assert att.shape == tuple(want_att.shape)
    assert bbx.shape == tuple(want_bbx.shape)
    np.testing.assert_allclose(att, want_att.numpy(), atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(bbx, want_bbx.numpy(), atol=5e-4, rtol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("bn_variance", ["exact", "shifted"])
def test_training_trajectory_parity(rng, bn_variance):
    """Beyond logits parity: the TRAINING MATH matches the reference.

    Same converted weights, same batch, same labels → run 4 Adam steps in
    pure torch (reference-shaped model + reference loss formulas) and in
    this framework's production train step (level-path loss, optax Adam),
    and assert the per-step loss trajectories coincide. Covers gradients,
    loss composition, Adam semantics, and BN training-mode moments in one
    end-to-end proof (the strongest accuracy-parity proxy after
    test_full_model_conversion_parity while real datasets are absent).
    """
    import jax

    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for
    from zsgnet_tpu.ops.anchors import match_and_encode
    from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

    VOCAB, EMB, HID, FPN_CH, HEAD_CH, A = 30, 16, 16, 64, 32, 9
    LR, LAMB, STEPS = 1e-3, 1.0, 4
    torch.manual_seed(0)  # unseeded init makes the fp32 drift budget flaky
    tm = TorchZSGNet(VOCAB, EMB, HID, FPN_CH, HEAD_CH, A).train()
    _randomize_bn(tm)

    converted = convert_zsgnet_checkpoint(
        tm.state_dict(),
        backbone_prefix="backbone.encoder.",
        fpn_prefix="backbone.fpn.",
        lstm_prefix="lstm.",
        embed_key="embedding.weight",
        head_conv_prefixes=(
            "head.conv0", "head.conv1", "head.conv2", "head.conv3", "head.out"
        ),
        num_anchors=A,
    )

    B, T = 2, 8
    img = rng.normal(size=(B, 64, 64, 3)).astype(np.float32)
    qvec = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    qlens = np.array([5, T], dtype=np.int32)
    annot = np.concatenate(
        [rng.uniform(-0.8, -0.2, (B, 2)), rng.uniform(0.2, 0.8, (B, 2))], axis=1
    ).astype(np.float32)

    cfg = Config(
        resize_img=(64, 64), emb_dim=EMB, lstm_dim=HID, fpn_ch=FPN_CH,
        head_ch=HEAD_CH, max_qlen=T, compute_dtype="float32", use_pallas=False,
        lr=LR, lamb_reg=LAMB, do_dist=False, bs=B, bn_variance=bn_variance,
    )
    anchors = anchor_pyramid_for(cfg)
    labels, reg_t = match_and_encode(
        jnp.asarray(anchors), jnp.asarray(annot),
        cfg.matching_threshold, cfg.neg_threshold, use_multi=cfg.use_multi,
    )
    labels_t = torch.tensor(np.asarray(labels))
    reg_t_t = torch.tensor(np.asarray(reg_t))

    # --- torch side: reference loss formulas, torch Adam ---
    def torch_loss(att, bbx):
        pos = (labels_t == 1).float()
        valid = (labels_t != -1).float()
        num_pos = pos.sum().clamp(min=1.0)
        x, t = att, pos
        bce = x.clamp(min=0) - x * t + torch.log1p(torch.exp(-x.abs()))
        p = torch.sigmoid(x)
        p_t = p * t + (1 - p) * (1 - t)
        alpha_t = 0.25 * t + 0.75 * (1 - t)
        cls = (alpha_t * (1 - p_t) ** 2 * bce * valid).sum() / num_pos
        beta = 1.0 / 9.0
        d = (bbx - reg_t_t).abs()
        sl = torch.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        box = (sl * pos[..., None]).sum() / num_pos
        return cls + LAMB * box

    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    img_t = torch.tensor(img.transpose(0, 3, 1, 2))
    qvec_t = torch.tensor(qvec.astype(np.int64))
    qlens_t = torch.tensor(qlens)
    torch_losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        att, bbx = tm(img_t, qvec_t, qlens_t)
        loss = torch_loss(att, bbx)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # --- framework side: production train step on the converted weights ---
    model = ZSGNet(cfg=cfg, vocab_size=VOCAB)
    batch = {
        "img": jnp.asarray(img), "qvec": jnp.asarray(qvec),
        "qlens": jnp.asarray(qlens), "annot": jnp.asarray(annot),
    }
    import jax as _jax

    state = create_train_state(cfg, model, batch, _jax.random.PRNGKey(0))
    state = state.replace(
        params=converted["params"],
        batch_stats=converted["batch_stats"],
        opt_state=state.tx.init(converted["params"]),
    )
    step = make_train_step(cfg, anchors, mesh=None)
    jax_losses = []
    for _ in range(STEPS):
        state, ls = step(state, batch)
        jax_losses.append(float(ls["total"]))

    # Per-step budget: fp32 associativity differences (conv reduction
    # order, XLA vs torch) are amplified by Adam's per-param normalization,
    # so the two trajectories drift geometrically — allow ~2×/step from a
    # 1e-3 base. The failure mode this test exists to catch is SYSTEMATIC
    # divergence: flax's fast-variance BN gradients blew this budget by
    # step 1 (>40% at step 2); "shifted"'s worst case (random running
    # stats, c far from μ) stays inside it.
    for i, (j, t) in enumerate(zip(jax_losses, torch_losses)):
        budget = 1e-3 * (2.5 ** i)
        assert abs(j - t) / abs(t) <= budget, (
            f"step {i}: jax {j} vs torch {t} exceeds rtol {budget:.4g} "
            f"(bn_variance={bn_variance}; full: {jax_losses} vs {torch_losses})"
        )
    assert jax_losses[-1] < 0.7 * jax_losses[0]  # both actually learned
    assert torch_losses[-1] < 0.7 * torch_losses[0]


@pytest.mark.slow
def test_convert_cli_end_to_end(rng, tmp_path):
    """`python -m zsgnet_tpu.convert ref.pth out/` — the migration CLI:
    auto-detects the reference layout from a DDP-wrapped trainer-format
    .pth, writes an Orbax checkpoint, and the restored model matches the
    torch forward."""
    import jax

    from zsgnet_tpu.convert.__main__ import detect_layout, main
    from zsgnet_tpu.train.checkpoint import CheckpointManager

    VOCAB, EMB, HID, FPN_CH, HEAD_CH, A = 30, 32, 32, 256, 64, 9
    torch.manual_seed(1)
    tm = TorchZSGNet(VOCAB, EMB, HID, FPN_CH, HEAD_CH, A).eval()
    _randomize_bn(tm)
    # Reference trainer save format + DDP module. wrapper (SURVEY §5).
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    pth = tmp_path / "ref.pth"
    torch.save({"model_state_dict": sd, "epoch": 3, "best_acc": 0.5}, pth)

    layout = detect_layout(tm.state_dict())
    assert layout["backbone_prefix"] == "backbone.encoder."
    assert layout["fpn_prefix"] == "backbone.fpn."
    assert layout["lstm_prefix"] == "lstm."
    assert layout["embed_key"] == "embedding.weight"
    assert layout["num_anchors"] == A
    assert layout["head_conv_prefixes"][-1] == "head.out"

    out_dir = tmp_path / "ckpt"
    report = main([str(pth), str(out_dir), "--resize_img=[96,96]",
                   "--lstm_dim=32", "--head_ch=64"])
    assert report["vocab_size"] == VOCAB
    assert report["leaves_converted"] > 0.9 * report["leaves_total"]

    restored = CheckpointManager(out_dir).restore()
    cfg = Config(
        resize_img=(96, 96), emb_dim=EMB, lstm_dim=HID, fpn_ch=FPN_CH,
        head_ch=HEAD_CH, max_qlen=8, compute_dtype="float32", use_pallas=False,
    )
    model = ZSGNet(cfg=cfg, vocab_size=VOCAB)
    B, T = 2, 8
    img = rng.normal(size=(B, 96, 96, 3)).astype(np.float32)
    qvec = rng.integers(1, VOCAB, size=(B, T)).astype(np.int32)
    qlens = np.array([5, T], dtype=np.int32)
    out = model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        {"img": jnp.asarray(img), "qvec": jnp.asarray(qvec), "qlens": jnp.asarray(qlens)},
        train=False,
    )
    with torch.no_grad():
        want_att, want_bbx = tm(
            torch.tensor(img.transpose(0, 3, 1, 2)),
            torch.tensor(qvec.astype(np.int64)),
            torch.tensor(qlens),
        )
    np.testing.assert_allclose(
        np.asarray(out["att_out"]), want_att.numpy(), atol=5e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["bbx_out"]), want_bbx.numpy(), atol=5e-4, rtol=2e-3
    )

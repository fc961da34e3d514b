"""Model forward tests: shapes, dtype policy, BiLSTM parity vs torch.

Tiny image sizes keep CPU compile times tractable; the anchor-count
relation (ΣHWA) is validated exactly against ops.anchors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.models.bilstm import BiLSTMEncoder
from zsgnet_tpu.models.zsgnet import ZSGNet, anchor_pyramid_for
from zsgnet_tpu.ops import anchors as anchor_ops


def tiny_cfg(**kw):
    base = dict(
        resize_img=(64, 64), lstm_dim=16, emb_dim=8, max_qlen=6,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
    )
    base.update(kw)
    return Config(**base)


def make_batch(rng, cfg, b=2, vocab=50):
    h, w = cfg.resize_img
    img = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    qvec = rng.integers(1, vocab, size=(b, cfg.max_qlen)).astype(np.int32)
    qlens = np.array([3, cfg.max_qlen], dtype=np.int32)[:b]
    return {
        "img": jnp.asarray(img),
        "qvec": jnp.asarray(qvec),
        "qlens": jnp.asarray(qlens),
    }


def test_zsgnet_retina_forward_shapes(rng):
    cfg = tiny_cfg()
    model = ZSGNet(cfg=cfg, vocab_size=50)
    batch = make_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    sizes = anchor_ops.feature_map_sizes(cfg.resize_img)
    total = sum(h * w for h, w in sizes) * cfg.num_anchors
    assert out["att_out"].shape == (2, total)
    assert out["bbx_out"].shape == (2, total, 4)
    assert out["att_out"].dtype == jnp.float32
    assert out["feat_sizes"] == sizes
    # Anchor pyramid must align with the flattened output.
    anchors = anchor_pyramid_for(cfg)
    assert anchors.shape == (total, 4)


def test_zsgnet_focal_prior_bias(rng):
    # With zero-init head convs the score logits should equal the focal
    # prior bias (≈ -4.59), keeping early focal loss small.
    cfg = tiny_cfg()
    model = ZSGNet(cfg=cfg, vocab_size=50)
    batch = make_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    att = np.asarray(out["att_out"])
    assert np.all(att < 0), "score logits should start negative (focal prior)"


def test_zsgnet_ssd_forward_shapes(rng):
    cfg = tiny_cfg(mdl_to_use="ssd_vgg", resize_img=(96, 96))
    model = ZSGNet(cfg=cfg, vocab_size=50)
    batch = make_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch)
    from zsgnet_tpu.models.ssd_vgg import ssd_feature_map_sizes

    sizes = ssd_feature_map_sizes(cfg.resize_img)
    assert out["feat_sizes"] == sizes
    total = sum(h * w for h, w in sizes) * cfg.num_anchors
    assert out["att_out"].shape == (2, total)


def test_query_mask_independence(rng):
    # Tokens past qlen must not affect the query vector (packed-seq parity).
    cfg = tiny_cfg()
    enc = BiLSTMEncoder(vocab_size=50, emb_dim=8, hidden=16)
    qvec = jnp.asarray(rng.integers(1, 50, size=(1, 6)).astype(np.int32))
    qlens = jnp.array([3], dtype=jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), qvec, qlens)
    out1 = enc.apply(variables, qvec, qlens)
    qvec2 = qvec.at[0, 4].set(17)  # mutate a padded position
    out2 = enc.apply(variables, qvec2, qlens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-7)


def test_bilstm_matches_torch(rng):
    """BiLSTM vs torch's packed-sequence LSTM with identical weights."""
    torch = pytest.importorskip("torch")
    B, T, E, H = 3, 5, 4, 6
    lengths = np.array([5, 3, 1], dtype=np.int32)
    x = rng.normal(size=(B, T, E)).astype(np.float32)

    tl = torch.nn.LSTM(E, H, bidirectional=True, batch_first=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True
    )
    _, (h_n, _) = tl(packed)
    want = torch.cat([h_n[0], h_n[1]], dim=-1).detach().numpy()  # (B, 2H)

    from zsgnet_tpu.models.bilstm import LSTMDirection

    def torch_params(direction):
        sfx = "_reverse" if direction else ""
        w_ih = getattr(tl, f"weight_ih_l0{sfx}").detach().numpy().T  # (E, 4H)
        w_hh = getattr(tl, f"weight_hh_l0{sfx}").detach().numpy().T
        b = (
            getattr(tl, f"bias_ih_l0{sfx}") + getattr(tl, f"bias_hh_l0{sfx}")
        ).detach().numpy()
        return {"w_ih": jnp.asarray(w_ih), "w_hh": jnp.asarray(w_hh), "bias": jnp.asarray(b)}

    xj, lj = jnp.asarray(x), jnp.asarray(lengths)
    fwd = LSTMDirection(H, reverse=False)
    _, h_fwd = fwd.apply({"params": torch_params(False)}, xj, lj)
    bwd = LSTMDirection(H, reverse=True)
    _, h_bwd = bwd.apply({"params": torch_params(True)}, xj, lj)
    got = np.concatenate([np.asarray(h_fwd), np.asarray(h_bwd)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decomposed_fusion_head_matches_concat_conv(rng):
    """PredictionHead's decomposed first conv must equal the naive
    'concat [vis|lang|grid] then 3x3 conv' formulation exactly."""
    import jax.numpy as jnp
    from zsgnet_tpu.models.zsgnet import PredictionHead
    from zsgnet_tpu.ops import anchors as anchor_ops

    B, H, W, CV, CL, MID = 2, 7, 5, 8, 12, 16
    head = PredictionHead(
        num_anchors=9, vis_ch=CV, lang_ch=CL, mid_ch=MID, depth=1,
        dtype=jnp.float32,
    )
    vis = jnp.asarray(rng.normal(size=(B, H, W, CV)).astype(np.float32))
    lang = jnp.asarray(rng.normal(size=(B, CL)).astype(np.float32))
    grid = jnp.asarray(anchor_ops.create_grid((H, W), flatten=False))
    variables = head.init(jax.random.PRNGKey(1), vis, lang, grid)
    got = head.apply(variables, vis, lang, grid)

    # Naive oracle: concat + conv with the same kernel, then the same tail.
    kernel = variables["params"]["conv0_kernel"]
    bias0 = variables["params"]["conv0_bias"]
    fused = jnp.concatenate(
        [vis, jnp.broadcast_to(lang[:, None, None, :], (B, H, W, CL)),
         jnp.broadcast_to(grid[None], (B, H, W, 2))], axis=-1,
    )
    y = jax.lax.conv_general_dilated(
        fused, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias0
    x = jnp.maximum(y, 0.0)
    k_out = variables["params"]["out"]["kernel"]
    b_out = variables["params"]["out"]["bias"]
    want = jax.lax.conv_general_dilated(
        x, k_out, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_out
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_decomposed_head_tiny_maps(rng):
    """Border-mask corrections must be right for 1x1 and 1xW maps."""
    import jax.numpy as jnp
    from zsgnet_tpu.models.zsgnet import PredictionHead
    from zsgnet_tpu.ops import anchors as anchor_ops

    for (H, W) in ((1, 1), (1, 4), (3, 1), (2, 2)):
        B, CV, CL, MID = 2, 4, 6, 8
        head = PredictionHead(
            num_anchors=2, vis_ch=CV, lang_ch=CL, mid_ch=MID, depth=1,
            dtype=jnp.float32,
        )
        vis = jnp.asarray(rng.normal(size=(B, H, W, CV)).astype(np.float32))
        lang = jnp.asarray(rng.normal(size=(B, CL)).astype(np.float32))
        grid = jnp.asarray(anchor_ops.create_grid((H, W), flatten=False))
        variables = head.init(jax.random.PRNGKey(0), vis, lang, grid)
        got = head.apply(variables, vis, lang, grid)
        kernel = variables["params"]["conv0_kernel"]
        bias0 = variables["params"]["conv0_bias"]
        fused = jnp.concatenate(
            [vis, jnp.broadcast_to(lang[:, None, None, :], (B, H, W, CL)),
             jnp.broadcast_to(grid[None], (B, H, W, 2))], axis=-1,
        )
        y = jax.lax.conv_general_dilated(
            fused, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias0
        x = jnp.maximum(y, 0.0)
        k_out = variables["params"]["out"]["kernel"]
        b_out = variables["params"]["out"]["bias"]
        want = jax.lax.conv_general_dilated(
            x, k_out, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b_out
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4,
            err_msg=f"H={H} W={W}",
        )


def test_spd_stem_matches_conv7x7(rng):
    """Space-to-depth stem must equal the plain 7x7/s2 stem exactly."""
    import jax.numpy as jnp
    from zsgnet_tpu.models.resnet import ResNet50

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    plain = ResNet50(dtype=jnp.float32, spd_stem=False)
    spd = ResNet50(dtype=jnp.float32, spd_stem=True)
    vp = plain.init(jax.random.PRNGKey(0), x)
    # Graft the plain stem kernel into the spd param tree.
    vs = spd.init(jax.random.PRNGKey(0), x)
    kernel = vp["params"]["conv1"]["kernel"]
    vs_params = dict(vs["params"])
    assert vs_params["conv1_kernel"].shape == kernel.shape
    vs_params["conv1_kernel"] = kernel
    # Copy every other param from the plain tree (they're named identically).
    for k, v in vp["params"].items():
        if k != "conv1":
            vs_params[k] = v
    out_p = plain.apply({"params": vp["params"], "batch_stats": vp["batch_stats"]}, x)
    out_s = spd.apply({"params": vs_params, "batch_stats": vp["batch_stats"]}, x)
    for a, b in zip(out_p, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_per_level_heads_use_same_atb_false(rng):
    """use_same_atb=False gives each pyramid level its own head params."""
    cfg = tiny_cfg(use_same_atb=False)
    model = ZSGNet(cfg=cfg, vocab_size=50)
    batch = make_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    names = set(variables["params"].keys())
    assert {"head0", "head1", "head2", "head3", "head4"} <= names
    assert "head" not in names
    out = model.apply(variables, batch)
    assert np.isfinite(np.asarray(out["att_out"])).all()


def test_canvas_head_matches_per_level(rng):
    """Canvas-packed head (cfg.head_canvas) is an EXACT reparameterization:
    same params, same inputs → same per-level outputs as the per-level head
    loop (models/canvas.py docstring; DESIGN.md roadmap #3)."""
    cfg = tiny_cfg()
    batch = make_batch(rng, cfg)
    model = ZSGNet(cfg=cfg, vocab_size=50)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out_ref = model.apply(variables, batch)

    model_c = ZSGNet(cfg=cfg.replace(head_canvas=True), vocab_size=50)
    out_c = model_c.apply(variables, batch)  # identical param tree

    np.testing.assert_allclose(
        np.asarray(out_c["att_out"]), np.asarray(out_ref["att_out"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_c["bbx_out"]), np.asarray(out_ref["bbx_out"]),
        rtol=1e-5, atol=1e-5,
    )


def test_canvas_pack_levels_geometry():
    from zsgnet_tpu.models.canvas import canvas_constants, pack_levels

    sizes = anchor_ops.feature_map_sizes((300, 300))  # 38,19,10,5,3
    layout = pack_levels(sizes)
    # No two levels overlap and every pair is separated by >= 1 cell.
    occ = canvas_constants(layout)["occupancy"][..., 0]
    assert occ.sum() == sum(h * w for h, w in sizes)  # no overlap
    for i, ((r1, c1), (h1, w1)) in enumerate(zip(layout.offsets, layout.sizes)):
        for (r2, c2), (h2, w2) in list(zip(layout.offsets, layout.sizes))[i + 1:]:
            # Expanding one box by the gap must not intersect the other.
            sep = (r1 - 1 >= r2 + h2 or r2 - 1 >= r1 + h1
                   or c1 - 1 >= c2 + w2 or c2 - 1 >= c1 + w1)
            assert sep, f"levels at {(r1, c1)} and {(r2, c2)} touch"
        assert r1 + h1 <= layout.height and c1 + w1 <= layout.width


def test_shifted_bn_matches_exact():
    """ShiftedBatchNorm (one-pass, models/norm.py) == exact-variance
    nn.BatchNorm in outputs, GRADIENTS, and running-stat updates, given a
    running mean near the batch mean (the pretrained-init regime)."""
    import flax.linen as nn
    import jax

    from zsgnet_tpu.models.norm import ShiftedBatchNorm

    rng_np = np.random.default_rng(1)
    x = (rng_np.normal(size=(4, 9, 9, 16)) * 3 + 5).astype(np.float32)
    g = rng_np.normal(size=x.shape).astype(np.float32)
    params = {
        "scale": jnp.asarray(rng_np.uniform(0.5, 1.5, 16).astype(np.float32)),
        "bias": jnp.asarray(rng_np.uniform(-0.5, 0.5, 16).astype(np.float32)),
    }
    # running mean near (not equal to) the batch mean; var arbitrary
    stats = {
        "mean": jnp.asarray((x.mean((0, 1, 2)) + 0.05).astype(np.float32)),
        "var": jnp.asarray(rng_np.uniform(5, 15, 16).astype(np.float32)),
    }
    kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
              dtype=jnp.float32, param_dtype=jnp.float32)
    exact = nn.BatchNorm(use_fast_variance=False, **kw)
    shifted = ShiftedBatchNorm(**kw)

    def run(mod, p, v):
        y, newv = mod.apply(
            {"params": p, "batch_stats": stats}, v, mutable=["batch_stats"]
        )
        return jnp.vdot(y, jnp.asarray(g)), (y, newv["batch_stats"])

    (s_e, (y_e, ns_e)), g_e = jax.value_and_grad(
        lambda p, v: run(exact, p, v), argnums=(0, 1), has_aux=True
    )(params, jnp.asarray(x))
    (s_s, (y_s, ns_s)), g_s = jax.value_and_grad(
        lambda p, v: run(shifted, p, v), argnums=(0, 1), has_aux=True
    )(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_e), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(ns_s[k]), np.asarray(ns_e[k]), rtol=1e-5, atol=1e-6
        )
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_e)):
        scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) / scale < 1e-4

    # eval mode: byte-identical to nn.BatchNorm (same running-stat formula)
    ek = dict(kw, use_running_average=True)
    y_ev_e = nn.BatchNorm(use_fast_variance=False, **ek).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    y_ev_s = ShiftedBatchNorm(**ek).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    np.testing.assert_array_equal(np.asarray(y_ev_s), np.asarray(y_ev_e))


def test_shifted16_forward_close_but_rejected_for_training():
    """The measured-rejected bf16-moment mode (BASELINE.md round 3) must
    not rot: forward stays within a few bf16 ulps of exact (the rejection
    is about GRADIENTS — tools/check_bn_grads.py reproduces rel-L2 1.28 —
    and about the absent speed win, not the forward)."""
    import jax

    from zsgnet_tpu.models.resnet import make_batch_norm

    rng_np = np.random.default_rng(0)
    x = jnp.asarray(
        (rng_np.normal(size=(4, 9, 9, 16)) * 3 + 5).astype(np.float32)
    ).astype(jnp.bfloat16)
    kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5,
              dtype=jnp.bfloat16, param_dtype=jnp.float32)
    outs = {}
    for mode in ("exact", "shifted16"):
        bn = make_batch_norm(mode, **kw)
        v = bn.init(jax.random.PRNGKey(0), x)
        y, _ = bn.apply(v, x, mutable=["batch_stats"])
        outs[mode] = np.asarray(y, dtype=np.float32)
    # ≤2 bf16 ulps at these magnitudes (|y| ≲ 4 → ulp ≈ 1/64)
    assert np.abs(outs["shifted16"] - outs["exact"]).max() <= 2 / 64 + 1e-6


def test_bn_variance_modes_share_param_tree(rng):
    """All three bn_variance modes init the identical variable tree, so
    checkpoints interchange."""
    cfg = tiny_cfg()
    batch = make_batch(rng, cfg)
    trees = []
    for mode in ("exact", "fast", "shifted"):
        model = ZSGNet(cfg=cfg.replace(bn_variance=mode), vocab_size=50)
        v = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0), batch, train=True)
        )
        trees.append(jax.tree.structure(v))
    assert trees[0] == trees[1] == trees[2]

"""Gradient accumulation (cfg.grad_accum) — exactness + integration.

The accumulation protocol (parallel/train_step.py::grads_accumulated)
claims EXACT full-batch grads because every loss path normalizes by a
clamped positive-anchor count that depends on annotations alone: each
microbatch's normalized partials are rescaled by its clamped count,
summed, and divided by the clamped total. These tests verify

  * the algebra directly on ``losses.zsg_loss`` — including the
    num_pos=0 clamp case a model-path test cannot reach (force-best
    matching guarantees positives per sample);
  * end-to-end bit-level agreement on the BN-free SSD-VGG path;
  * mesh composition (grad_accum × shard_map);
  * the BN caveat: retina still trains (finite loss, stats move).

SURVEY §2.10/§2.11: the reference trains at effective batch 64 via
4 GPUs × bs 16; grad_accum gives one chip the same effective batch at
600² where the full batch does not fit in HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.ops import losses
from zsgnet_tpu.parallel.mesh import make_mesh
from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ga_data")
    synthetic.generate(root, n_train=16, n_val=8, n_test=8, img_size=96)
    return root


def _cfg(root, tmp, **kw):
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=0, lr=1e-2,
        resize_img=(96, 96), max_qlen=8, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
        do_dist=False, tmp_path=str(tmp), opt_to_use="sgd", seed=3,
    )
    base.update(kw)
    return Config(**base)


def _state_and_batch(cfg, data, key=0):
    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(key))
    return state, dev


def test_accumulation_algebra_with_zero_pos_microbatch(rng):
    """Manual 2-microbatch accumulation == full-batch zsg_loss grads,
    with one microbatch containing ZERO positives (clamp engaged)."""
    B, A = 8, 32
    att = jnp.asarray(rng.normal(size=(B, A)).astype(np.float32))
    reg = jnp.asarray(rng.normal(size=(B, A, 4)).astype(np.float32))
    labels = rng.choice([-1, 0, 1], size=(B, A), p=[0.1, 0.7, 0.2]).astype(np.int32)
    labels[B // 2:] = np.minimum(labels[B // 2:], 0)  # 2nd half: no positives
    assert (labels[B // 2:] == 1).sum() == 0 and (labels[: B // 2] == 1).sum() > 0
    labels = jnp.asarray(labels)
    reg_t = jnp.asarray(rng.normal(size=(B, A, 4)).astype(np.float32))

    def full(att, reg):
        return losses.zsg_loss(att, reg, labels, reg_t)["total"]

    g_full = jax.grad(full, argnums=(0, 1))(att, reg)
    full_ls = full(att, reg)

    # The train-step protocol, by hand over two halves.
    g_acc = [jnp.zeros_like(att), jnp.zeros_like(reg)]
    s_acc, n_acc = 0.0, 0.0
    for sl in (slice(0, B // 2), slice(B // 2, B)):
        def micro(a, r, sl=sl):
            return losses.zsg_loss(a, r, labels[sl], reg_t[sl])["total"]
        ls = losses.zsg_loss(att[sl], reg[sl], labels[sl], reg_t[sl])
        w = float(jnp.maximum(ls["num_pos"], 1.0))
        gm = jax.grad(micro, argnums=(0, 1))(att[sl], reg[sl])
        g_acc[0] = g_acc[0].at[sl].add(gm[0] * w)
        g_acc[1] = g_acc[1].at[sl].add(gm[1] * w)
        s_acc += float(ls["total"]) * w
        n_acc += float(ls["num_pos"])
    n_tot = max(n_acc, 1.0)
    np.testing.assert_allclose(np.asarray(g_acc[0]) / n_tot, np.asarray(g_full[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_acc[1]) / n_tot, np.asarray(g_full[1]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(s_acc / n_tot, float(full_ls), rtol=1e-6)


@pytest.mark.slow  # Slow tier (r5 gate re-tier): the family keeps the algebra test and
    # the retina smoke unmarked; this 90 s e2e exactness run is nightly.
def test_grad_accum_exact_on_bn_free_ssd(synth_root, tmp_path):
    """grad_accum=4 == one-shot step on SSD-VGG (no BatchNorm anywhere):
    identical loss and near-identical params after one SGD step (fp32
    reassociation of the 4-way sum is the only difference)."""
    cfg1 = _cfg(synth_root, tmp_path, mdl_to_use="ssd_vgg")
    cfg4 = cfg1.replace(grad_accum=4)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state4, _ = _state_and_batch(cfg4, data)
    anchors = anchor_pyramid_for(cfg1)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    s4, ls4 = make_train_step(cfg4, anchors, mesh=None)(state4, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(ls4["total"]), rtol=1e-6)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(ls4["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accum_rejects_indivisible_batch(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, mdl_to_use="ssd_vgg", grad_accum=3)
    data = get_data(cfg)
    state, dev = _state_and_batch(cfg, data)
    anchors = anchor_pyramid_for(cfg)
    with pytest.raises(ValueError, match="grad_accum"):
        make_train_step(cfg, anchors, mesh=None)(state, dev)


@pytest.mark.slow
def test_grad_accum_composes_with_mesh(synth_root, tmp_path):
    """8-way shard_map × grad_accum=2 == 8-way shard_map alone (SSD).
    Per-shard microbatches are bs/16 = 2 samples; the psum'd num_pos
    normalizer must still reproduce the global-batch grads exactly."""
    cfg1 = _cfg(synth_root, tmp_path, mdl_to_use="ssd_vgg", bs=16, do_dist=True)
    cfg2 = cfg1.replace(grad_accum=2)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state2, _ = _state_and_batch(cfg2, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg1)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=mesh)(state1, dev)
    s2, ls2 = make_train_step(cfg2, anchors, mesh=mesh)(state2, dev)
    np.testing.assert_allclose(float(ls1["total"]), float(ls2["total"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accum_retina_bn_smoke(synth_root, tmp_path):
    """Retina (BatchNorm) path: per-microbatch moments are the documented
    caveat — the step must still run, produce finite loss, and advance
    the running stats through the scan carry."""
    cfg = _cfg(synth_root, tmp_path, resize_img=(64, 64), grad_accum=2)
    data = get_data(cfg)
    state, dev = _state_and_batch(cfg, data)
    anchors = anchor_pyramid_for(cfg)
    # donate_argnums=0 invalidates the input state's buffers — snapshot.
    stats_before = [np.asarray(a) for a in jax.tree.leaves(state.batch_stats)]
    new_state, ls = make_train_step(cfg, anchors, mesh=None)(state, dev)
    assert np.isfinite(float(ls["total"]))
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(stats_before, jax.tree.leaves(new_state.batch_stats))
    )
    assert moved, "BN running stats did not advance through the scan"

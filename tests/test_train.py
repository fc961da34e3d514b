"""End-to-end training tests on the 8-device CPU mesh.

The SURVEY.md §4 strategy: overfit-a-batch must drive loss down; the
sharded train step must agree with the unsharded one; checkpoints must
round-trip through the Learner.
"""

from pathlib import Path

import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.train.learner import Learner, SmoothenValue


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.generate(root, n_train=16, n_val=8, n_test=8, img_size=64)
    return root


def tiny_cfg(root, tmp, **kw):
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=2, lr=2e-3,
        resize_img=(64, 64), max_qlen=8, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
        do_dist=True, tmp_path=str(tmp), log_every=1, seed=3,
    )
    base.update(kw)
    return Config(**base)


def test_smoothen_value():
    s = SmoothenValue(beta=0.5)
    s.add_value(1.0)
    assert abs(s.smooth - 1.0) < 1e-9
    s.add_value(0.0)
    assert 0.0 < s.smooth < 1.0


@pytest.mark.slow
def test_overfit_batch_loss_decreases(synth_root, tmp_path):
    cfg = tiny_cfg(synth_root, tmp_path)
    data = get_data(cfg)
    learn = Learner("t_overfit", data, cfg)
    first, last = learn.overfit_batch(steps=40)
    assert last < first * 0.5, f"loss did not drop: {first} → {last}"


@pytest.mark.slow
def test_sharded_matches_single_device(synth_root, tmp_path):
    """Grad-pmean DP must produce the same update as one big device."""
    import jax

    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
    from zsgnet_tpu.parallel.mesh import make_mesh
    from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

    # SGD: linear in grad, so fp32 psum reduction-order noise stays tiny.
    # (Adam's first step is ~±lr·sign(grad) — unstable for near-zero grads.)
    cfg = tiny_cfg(synth_root, tmp_path, opt_to_use="sgd")
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}

    model = get_default_net(cfg, vocab_size=len(data.vocab))
    model_sync = get_default_net(
        cfg.replace(bn_sync_axis=cfg.data_axis), vocab_size=len(data.vocab)
    )
    state1 = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    state2 = create_train_state(cfg, model_sync, dev, jax.random.PRNGKey(0))
    anchors = anchor_pyramid_for(cfg)

    step_single = make_train_step(cfg, anchors, mesh=None)
    mesh = make_mesh(cfg)
    step_sharded = make_train_step(cfg, anchors, mesh=mesh)

    s1, ls1 = step_single(state1, dev)
    s2, ls2 = step_sharded(state2, dev)
    np.testing.assert_allclose(float(ls1["total"]), float(ls2["total"]), rtol=1e-4)
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    # fp32 reduction-order differences (8-way psum trees vs one big reduce,
    # esp. through sync-BN backward) leave sub-1e-3 per-element wiggle after
    # an lr=2e-3 step; the exact loss equality above is the semantic check.
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_fit_one_epoch_and_checkpoint_roundtrip(synth_root, tmp_path):
    cfg = tiny_cfg(synth_root, tmp_path, epochs=1)
    data = get_data(cfg)
    learn = Learner("t_fit", data, cfg)
    learn.fit(1)
    assert learn.log_file.exists()
    m1 = learn.validate()
    assert "Acc" in m1 and "MaxPos" in m1

    # Fresh learner restores the saved state and reproduces val metrics.
    cfg2 = cfg.replace(resume=True)
    learn2 = Learner("t_fit", data, cfg2)
    m2 = learn2.validate()
    np.testing.assert_allclose(m1["MeanIoU"], m2["MeanIoU"], atol=1e-5)


def test_testing_split(synth_root, tmp_path):
    cfg = tiny_cfg(synth_root, tmp_path)
    data = get_data(cfg)
    learn = Learner("t_test", data, cfg)
    m = learn.testing()
    assert m["num_samples"] == 8


def test_glove_init_applied(synth_root, tmp_path):
    """cfg.glove_path initializes the embedding table through the Learner."""
    import jax.numpy as jnp

    data0 = get_data(tiny_cfg(synth_root, tmp_path))
    word = next(w for w in data0.vocab.word_to_id if w not in ("<pad>", "<unk>"))
    emb_dim = 16
    glove = tmp_path / "glove.txt"
    glove.write_text(f"{word} " + " ".join(["0.5"] * emb_dim) + "\n")

    cfg = tiny_cfg(synth_root, tmp_path, emb_dim=emb_dim, glove_path=str(glove))
    learn = Learner("t_glove", get_data(cfg), cfg)
    table = np.asarray(learn.state.params["query_enc"]["embed"]["embedding"])
    idx = data0.vocab.word_to_id[word]
    np.testing.assert_allclose(table[idx], 0.5)
    np.testing.assert_allclose(table[0], 0.0)  # PAD


@pytest.mark.slow
def test_partial_warm_start_load(synth_root, tmp_path):
    """load_normally=False warm-starts matching leaves, keeps fresh ones."""
    import jax

    cfg = tiny_cfg(synth_root, tmp_path)
    data = get_data(cfg)
    learn = Learner("t_warm", data, cfg)
    learn.overfit_batch(steps=2)
    learn.save_model_dict()
    trained_kernel = np.asarray(
        learn.state.params["backbone"]["conv1"]["kernel"]
    ).copy()

    cfg2 = cfg.replace(resume=True, load_normally=False, seed=99)
    learn2 = Learner("t_warm", data, cfg2)
    # Matching leaves restored from the checkpoint...
    np.testing.assert_allclose(
        np.asarray(learn2.state.params["backbone"]["conv1"]["kernel"]),
        trained_kernel, atol=1e-6,
    )
    # ...and the optimizer is fresh (step 0 moments).
    import optax
    flat = jax.tree.leaves(learn2.state.opt_state)
    assert all(float(np.abs(np.asarray(x)).max()) == 0.0
               for x in flat if hasattr(x, "shape") and x.size > 1)


@pytest.mark.slow
def test_no_retrace_across_batches(synth_root, tmp_path):
    """SURVEY §4: static shapes → the jitted step must compile exactly once."""
    cfg = tiny_cfg(synth_root, tmp_path)
    data = get_data(cfg)
    learn = Learner("t_retrace", data, cfg)
    it = iter(data.train_dl)
    for _ in range(2):
        batch = next(it)
        learn.state, _ = learn.train_step(
            learn.state, learn._shard(learn._device_view(batch, train=True))
        )
    assert learn.train_step._cache_size() == 1, "train step retraced"


def test_batchloader_start_batch_skips_without_reorder(synth_root, tmp_path):
    """start_batch=k yields exactly the tail of the same deterministic
    epoch sequence, one-shot (the next epoch starts at 0 again)."""
    cfg = tiny_cfg(synth_root, tmp_path, bs=4, nw=1, do_dist=False)
    data = get_data(cfg)
    dl = data.train_dl
    dl.set_epoch(5)
    full = [b["img"] for b in dl]
    dl.set_epoch(5)
    dl.start_batch = 2
    tail = [b["img"] for b in dl]
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a, b)
    assert dl.start_batch == 0  # consumed
    dl.set_epoch(5)
    assert len(list(dl)) == len(full)


@pytest.mark.slow
def test_midepoch_resume_exact(synth_root, tmp_path):
    """Preemption-safe mid-epoch checkpointing (cfg.ckpt_every_steps):
    resume from a mid-epoch save and finish the epoch — the final state
    must EQUAL the uninterrupted run bit-grade (SSD-VGG: no BatchNorm;
    SGD: linear in grads; the deterministic (seed, epoch) loader replays
    the identical remaining batches)."""
    import jax

    # 16 train samples / bs 4 → 4 batches per epoch; saves at batch 2.
    kw = dict(bs=4, nw=1, do_dist=False, opt_to_use="sgd",
              mdl_to_use="ssd_vgg", ckpt_every_steps=2, epochs=1)
    cfg_a = tiny_cfg(synth_root, tmp_path / "a", **kw)
    data_a = get_data(cfg_a)
    learn_a = Learner("t_mid_a", data_a, cfg_a)
    learn_a.fit(1)
    assert int(learn_a.state.step) == len(data_a.train_dl)

    # Interrupted twin: same seed/arch → same init; restore the batch-2
    # preemption point explicitly, then finish.
    cfg_b = tiny_cfg(synth_root, tmp_path / "b", **kw)
    data_b = get_data(cfg_b)
    learn_b = Learner("t_mid_b", data_b, cfg_b)
    learn_b.fit(1)  # writes the step-2 mid-epoch checkpoint along the way
    learn_c = Learner("t_mid_b", data_b, cfg_b)  # same model_dir as b
    learn_c.load_model_dict(step=2)
    assert learn_c.epoch == 0 and learn_c._resume_batches == 2
    assert int(learn_c.state.step) == 2
    learn_c.fit(1)  # resumes epoch 0 at batch 2, runs batches 2..3
    assert int(learn_c.state.step) == len(data_b.train_dl)
    assert learn_c.epoch == 1

    for a, c in zip(jax.tree.leaves(learn_a.state.params),
                    jax.tree.leaves(learn_c.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree.leaves(learn_a.state.opt_state),
                    jax.tree.leaves(learn_c.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_graceful_stop_resume_exact(synth_root, tmp_path):
    """Learner.request_stop (the SIGTERM path): fit stops at the next
    batch boundary, checkpoints the exact position, and a resumed run
    finishes with state EQUAL to the uninterrupted twin (SSD+SGD,
    deterministic loader — same bit-grade protocol as
    test_midepoch_resume_exact, but stop-driven instead of periodic)."""
    import jax

    kw = dict(bs=4, nw=1, do_dist=False, opt_to_use="sgd",
              mdl_to_use="ssd_vgg", epochs=2)
    cfg_a = tiny_cfg(synth_root, tmp_path / "a", **kw)
    data_a = get_data(cfg_a)
    learn_a = Learner("t_stop_a", data_a, cfg_a)
    learn_a.fit(2)  # 2 epochs x 4 batches

    cfg_b = tiny_cfg(synth_root, tmp_path / "b", **kw)
    data_b = get_data(cfg_b)
    learn_b = Learner("t_stop_b", data_b, cfg_b)
    orig_step = learn_b.train_step  # build, then wrap: stop after step 3
    calls = {"n": 0}

    def wrapped(state, batch):
        out = orig_step(state, batch)
        calls["n"] += 1
        if calls["n"] == 3:
            learn_b.request_stop()
        return out

    learn_b._train_step = wrapped
    learn_b.fit(2)
    assert int(learn_b.state.step) == 3  # stopped mid-epoch 0
    assert learn_b.epoch == 0

    resumed = Learner("t_stop_b", data_b, cfg_b.replace(resume=True))
    assert int(resumed.state.step) == 3 and resumed._resume_batches == 3
    resumed.fit(2)  # batch 3 of epoch 0, then all of epoch 1
    assert int(resumed.state.step) == 8 and resumed.epoch == 2

    for a, c in zip(jax.tree.leaves(learn_a.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
@pytest.mark.parametrize("variant", [
    dict(use_focal=False, use_softmax=False),            # BCE head
    dict(use_focal=False, use_softmax=True),             # softmax-CE head
    dict(use_focal=True, use_multi=False),               # focal, single-pos
    dict(use_focal=True, use_level_path=False),          # focal, flat path
    dict(mdl_to_use="ssd_vgg", use_focal=False, use_softmax=True),
], ids=["bce", "softmax", "single_pos", "flat", "ssd_softmax"])
def test_train_and_eval_step_loss_variant_matrix(synth_root, tmp_path, variant):
    """Every reference loss-flag combination must run END-TO-END (full
    train step + eval step), not just at the loss-function unit level —
    cross-combination breaks (dispatch in make_compute_loss, level-path
    fallbacks, eval reusing the train variant) only surface here."""
    import jax

    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
    from zsgnet_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    cfg = tiny_cfg(synth_root, tmp_path, do_dist=False, nw=1, **variant)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    anchors = anchor_pyramid_for(cfg)

    state, ls = make_train_step(cfg, anchors, mesh=None)(state, dev)
    assert np.isfinite(float(ls["total"])), (variant, ls)
    assert float(ls["num_pos"]) > 0
    ev = make_eval_step(cfg, anchors, mesh=None)(state, dev)
    assert np.isfinite(np.asarray(ev["loss"])).all()
    assert np.asarray(ev["iou"]).shape == (cfg.bs,)


def test_plateau_scheduler_semantics():
    """Epoch-granular ReduceLROnPlateau on the val metric (VERDICT r1 #3)."""
    from zsgnet_tpu.train.learner import PlateauScheduler

    s = PlateauScheduler(factor=0.5, patience=2)
    assert s.step(0.5) == 1.0  # first value = improvement
    assert s.step(0.5) == 1.0  # bad epoch 1
    assert s.step(0.5) == 1.0  # bad epoch 2 (== patience, not yet over)
    assert s.step(0.5) == 0.5  # bad epoch 3 > patience → scale drops
    assert s.step(0.6) == 0.5  # improvement resets the counter only
    assert s.step(0.6) == 0.5
    assert s.step(0.6) == 0.5
    assert s.step(0.6) == 0.25


def test_lr_scale_zero_freezes_params(synth_root, tmp_path):
    """TrainState.lr_scale multiplies updates inside the jitted step."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg(synth_root, tmp_path)
    data = get_data(cfg)
    learn = Learner("t_lrscale", data, cfg)
    learn.state = learn._replicate(
        learn.state.replace(lr_scale=jnp.zeros((), jnp.float32))
    )
    before = jax.tree.map(np.asarray, learn.state.params)
    batch = next(iter(data.train_dl))
    learn.state, _ = learn.train_step(
        learn.state, learn._shard(learn._device_view(batch, train=True))
    )
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(learn.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_best_checkpoint_survives_rotation(synth_root, tmp_path):
    """The best-val-Acc checkpoint must outlive max_to_keep GC of the
    rotating store, and prefer_best must restore it (VERDICT r1 weak #4)."""
    cfg = tiny_cfg(synth_root, tmp_path)
    data = get_data(cfg)
    learn = Learner("t_best", data, cfg)
    learn.overfit_batch(steps=1)  # step 1
    learn.best_metric = 0.9
    learn.save_model_dict(best=True)
    best_kernel = np.asarray(learn.state.params["head"]["conv0_kernel"]).copy()
    for _ in range(4):  # steps 2..5, all non-best
        learn.overfit_batch(steps=1)
        learn.save_model_dict(best=False)
    assert learn.ckpt.latest_step() == 5
    assert learn.ckpt_best.latest_step() == 1  # survived the rotation

    learn2 = Learner("t_best", data, cfg)
    learn2.load_model_dict(prefer_best=True)
    assert int(learn2.state.step) == 1
    np.testing.assert_array_equal(
        np.asarray(learn2.state.params["head"]["conv0_kernel"]), best_kernel
    )


def test_eval_loss_matches_train_variant(synth_root, tmp_path):
    """Validation loss must use the SAME variant training optimizes —
    here BCE + best-anchor-only (r1 bug: eval always computed focal/multi
    and dropped use_multi on the flat path)."""
    import jax.numpy as jnp

    from zsgnet_tpu.ops import anchors as anchor_ops
    from zsgnet_tpu.ops import losses

    cfg = tiny_cfg(
        synth_root, tmp_path, use_focal=False, use_multi=False, do_dist=False
    )
    data = get_data(cfg)
    learn = Learner("t_evloss", data, cfg)
    batch = next(iter(data.valid_dl))
    ev = learn.eval_step(learn.state, learn._shard(learn._device_view(batch)))

    variables = {"params": learn.state.params, "batch_stats": learn.state.batch_stats}
    out = learn.model.apply(variables, learn._device_view(batch), train=False)
    labels, reg_t = anchor_ops.match_and_encode(
        jnp.asarray(learn.anchors), jnp.asarray(batch["annot"]),
        cfg.matching_threshold, cfg.neg_threshold, use_multi=False,
    )
    ls = losses.zsg_loss(
        out["att_out"], out["bbx_out"], labels, reg_t,
        lamb_reg=cfg.lamb_reg, use_focal=False, use_softmax=False,
    )
    np.testing.assert_allclose(
        np.asarray(ev["loss"])[0], float(ls["total"]), rtol=1e-5
    )
    # ...and the Evaluator surfaces it as the val 'loss' metric.
    m = learn.validate()
    assert "loss" in m and np.isfinite(m["loss"])


@pytest.mark.slow
def test_remat_backbone_step(synth_root, tmp_path):
    """cfg.remat_backbone (jax.checkpoint over bottlenecks) must train."""
    cfg = tiny_cfg(synth_root, tmp_path, remat_backbone=True)
    data = get_data(cfg)
    learn = Learner("t_remat", data, cfg)
    first, last = learn.overfit_batch(steps=3)
    assert np.isfinite(last)


def test_tensorboard_scalar_export(synth_root, tmp_path):
    """cfg.use_tensorboard mirrors JSONL rows to TB event files (rank-0)."""
    pytest.importorskip("tensorboardX")
    cfg = tiny_cfg(synth_root, tmp_path, do_dist=False, use_tensorboard=True)
    data = get_data(cfg)
    learn = Learner("t_tb", data, cfg)
    learn._log_row({"epoch": 0, "step": 1, "train_total": 1.5, "val_Acc": 0.25})
    tb_dir = Path(cfg.tmp_path) / "logs" / "tb" / "t_tb"
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_device_prefetch_order_and_pairing(synth_root, tmp_path):
    """_device_prefetch preserves batch order and pairs each sharded view
    with its own host batch (eval relies on case/idxs/valid alignment)."""
    cfg = tiny_cfg(synth_root, tmp_path, do_dist=False)
    data = get_data(cfg)
    learn = Learner("t_prefetch", data, cfg)
    host = list(data.valid_dl)
    pairs = list(learn._device_prefetch(iter(host)))
    assert len(pairs) == len(host)
    for (sharded, hb), want in zip(pairs, host):
        assert hb is want
        np.testing.assert_array_equal(np.asarray(sharded["qvec"]), want["qvec"])


def test_fit_lr_override_preserves_adam_moments(synth_root, tmp_path):
    """fit(lr=) semantics (VERDICT r3 weak #4): the override folds into
    TrainState.lr_scale — Adam moments SURVIVE (the old behavior rebuilt
    the optimizer and silently zeroed them, also on resumed Learners),
    the effective LR becomes exactly the requested value, and the scale
    rides checkpoints so a resume continues at the overridden LR."""
    import jax
    import optax

    cfg = tiny_cfg(synth_root, tmp_path, epochs=3, nw=0)
    data = get_data(cfg)
    learn = Learner("t_lr_override", data, cfg)
    learn.fit(1)

    def adam_mu_norm(state):
        for part in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
        ):
            if isinstance(part, optax.ScaleByAdamState):
                return sum(float(np.abs(np.asarray(m)).sum())
                           for m in jax.tree.leaves(part.mu))
        raise AssertionError("no Adam state found")

    mu_before = adam_mu_norm(learn.state)
    assert mu_before > 0  # trained — moments are live
    learn.fit(2, lr=cfg.lr / 10)
    assert abs(float(learn.state.lr_scale) - 0.1) < 1e-6
    assert learn._effective_lr() == pytest.approx(cfg.lr / 10, rel=1e-6)
    # moments were not re-initialized: the state evolved FROM the trained
    # moments (a tx.init reset would zero mu; one epoch from zero at
    # lr/10 cannot reproduce the magnitude check below by accident
    # because we compare against the zeroed counterfactual)
    mu_after = adam_mu_norm(learn.state)
    assert mu_after > 0.25 * mu_before

    # checkpoint roundtrip keeps the override
    learn.save_model_dict(best=False)
    learn2 = Learner("t_lr_override", data, cfg)
    learn2.load_model_dict()
    assert abs(float(learn2.state.lr_scale) - 0.1) < 1e-6


def test_fit_warns_past_decay_horizon(synth_root, tmp_path, capsys):
    """ADVICE r3 #1: a fit() budget beyond the constructed LR decay
    horizon prints a loud warning instead of silently training at the
    lr_min_frac floor. The warning fires BEFORE the epoch loop, so the
    test pins a budget-already-reached Learner — the warning must still
    print while fit() returns without compiling a train step (this kept
    a pure-message test from costing 70 s of gate time)."""
    cfg = tiny_cfg(synth_root, tmp_path, epochs=1, nw=0,
                   lr_schedule="cosine", lr_min_frac=0.0)
    data = get_data(cfg)
    learn = Learner("t_horizon", data, cfg)
    assert learn.cfg.lr_decay_steps == len(data.train_dl)  # auto-filled
    learn.epoch = 3  # budget reached: fit(3) warns, then trains nothing
    learn.fit(3)
    out = capsys.readouterr().out
    assert "exceed the LR decay horizon" in out
    assert "nothing to train" in out and int(learn.state.step) == 0


def test_config_validates_enums_early():
    """ADVICE r3 #3: bad enum values fail at Config construction, not
    minutes later at first trace."""
    with pytest.raises(ValueError, match="lr_schedule"):
        Config(lr_schedule="cosin")
    with pytest.raises(ValueError, match="spatial_mode"):
        Config(spatial_mode="manual")
    with pytest.raises(ValueError, match="queries_per_img"):
        Config(queries_per_img=0)


def test_train_step_rejects_zero_decay_horizon(synth_root, tmp_path):
    """ADVICE r3 #2: non-const schedule with the unset (0) horizon raises
    at trace time instead of collapsing the LR to the floor."""
    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
    from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = tiny_cfg(synth_root, tmp_path, do_dist=False,
                   lr_schedule="cosine", lr_decay_steps=0)
    data = get_data(cfg)
    batch = data.train_dl.first_batch()
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}
    import jax

    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="lr_decay_steps"):
        make_train_step(cfg, anchor_pyramid_for(cfg), mesh=None)(state, dev)


def test_device_view_matches_step_batch_keys(synth_root, tmp_path):
    """Contract guard (r5 — the nightly caught a fast-gate blind spot):
    the keys the Learner ships to the TRAIN step must equal
    train_batch_keys(cfg) exactly — the GSPMD spatial train step's
    in_shardings dict is structure-strict, and the loader always emits
    an all-ones ``valid`` even under drop_last=True, so an accidental
    extra key is a pytree error only the slow spatial-fit tests would
    see. Eval views must match eval_batch_keys the same way."""
    from zsgnet_tpu.parallel.train_step import eval_batch_keys, train_batch_keys

    cfg = tiny_cfg(synth_root, tmp_path, nw=1)
    data = get_data(cfg)
    learn = Learner("t_keys", data, cfg)
    tb = next(iter(data.train_dl))
    assert "valid" in tb  # the loader emits it even for drop_last=True
    assert set(learn._device_view(tb, train=True)) == set(train_batch_keys(cfg))
    vb = data.valid_dl.first_batch()
    assert set(learn._device_view(vb)) == set(eval_batch_keys(cfg))
    # Grouped configs add pair_valid on both sides.
    assert "pair_valid" in train_batch_keys(cfg.replace(queries_per_img=3))
    assert "pair_valid" in eval_batch_keys(cfg.replace(queries_per_img=3))

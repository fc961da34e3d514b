"""Step-granular LR schedules (cfg.lr_schedule / warmup_steps).

Beyond-reference capability (SURVEY.md §2 item 10 — the reference ships
only epoch-granular ReduceLROnPlateau): warmup + cosine/linear decay
computed inside the jitted step from the checkpointed ``TrainState.step``.
Verified here at three layers: the pure schedule math, the actual scaled
parameter update (exactly ``scale ×`` the const-schedule update), and the
Learner's horizon auto-fill + effective-LR logging.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.parallel.train_step import lr_schedule_scale


def _scale(cfg, step):
    return float(lr_schedule_scale(cfg, jnp.asarray(step, jnp.int32)))


def test_const_is_identity():
    cfg = Config(lr_schedule="const")
    for s in (0, 1, 1000):
        assert _scale(cfg, s) == 1.0


def test_warmup_ramp():
    cfg = Config(lr_schedule="const", warmup_steps=4)
    # (s+1)/w — the first update trains at lr/w, never 0.
    assert _scale(cfg, 0) == pytest.approx(0.25)
    assert _scale(cfg, 1) == pytest.approx(0.5)
    assert _scale(cfg, 3) == pytest.approx(1.0)
    assert _scale(cfg, 100) == 1.0


def test_cosine_endpoints_floor_and_clamp():
    cfg = Config(lr_schedule="cosine", warmup_steps=10,
                 lr_decay_steps=110, lr_min_frac=0.1)
    assert _scale(cfg, 10) == pytest.approx(1.0)          # decay start
    mid = _scale(cfg, 60)                                  # halfway
    assert mid == pytest.approx(0.1 + 0.9 * 0.5, abs=1e-6)
    assert _scale(cfg, 110) == pytest.approx(0.1, abs=1e-6)  # horizon
    assert _scale(cfg, 10_000) == pytest.approx(0.1, abs=1e-6)  # clamped


def test_linear_decay():
    cfg = Config(lr_schedule="linear", lr_decay_steps=100)
    assert _scale(cfg, 0) == pytest.approx(1.0)
    assert _scale(cfg, 50) == pytest.approx(0.5)
    assert _scale(cfg, 100) == pytest.approx(0.0, abs=1e-6)


def test_unknown_schedule_raises():
    # Since the ADVICE-r3 fix, bad enum values fail at Config construction
    # (before any expensive model init), not at first trace.
    with pytest.raises(ValueError, match="lr_schedule"):
        Config(lr_schedule="polynomial")


def test_unknown_schedule_raises_at_trace_too():
    # Defense in depth: a config that dodges __post_init__ validation
    # (object.__setattr__ on the frozen dataclass) still fails loudly at
    # trace time rather than silently training at the floor LR.
    cfg = Config(lr_schedule="const")
    object.__setattr__(cfg, "lr_schedule", "polynomial")
    with pytest.raises(ValueError, match="lr_schedule"):
        lr_schedule_scale(cfg, jnp.asarray(0, jnp.int32))


# ---------------------------------------------------------------------------
# Integration: the scheduled step applies EXACTLY scale × the const update.


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from zsgnet_tpu.data import synthetic

    root = tmp_path_factory.mktemp("data")
    synthetic.generate(root, n_train=8, n_val=8, n_test=8, img_size=64)
    return root


def _tiny_cfg(root, tmp, **kw):
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=0, lr=2e-3,
        resize_img=(64, 64), max_qlen=8, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
        do_dist=False, tmp_path=str(tmp),
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow  # Slow tier (r5): the schedule's pure-function tests stay fast.
def test_scheduled_update_is_scaled_const_update(synth_root, tmp_path):
    import jax

    from zsgnet_tpu.data.dataset import get_data
    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
    from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

    cfg = _tiny_cfg(synth_root, tmp_path)
    # warmup_steps=4 → scale at step 0 is exactly 0.25. XLA fuses the
    # scale multiply into the Adam epilogue with different reassociation
    # than the const step, so the comparison is fusion-rounding-tight
    # (~6e-5 rel observed), not bit-exact.
    cfg_warm = cfg.replace(warmup_steps=4)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    anchors = anchor_pyramid_for(cfg)

    s_const = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    s_warm = create_train_state(cfg_warm, model, dev, jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, s_const.params)

    n_const, _ = make_train_step(cfg, anchors)(s_const, dev)
    n_warm, _ = make_train_step(cfg_warm, anchors)(s_warm, dev)

    d_const = jax.tree.leaves(
        jax.tree.map(lambda a, b: np.asarray(a) - b, n_const.params, p0))
    d_warm = jax.tree.leaves(
        jax.tree.map(lambda a, b: np.asarray(a) - b, n_warm.params, p0))
    assert any(np.abs(d).max() > 0 for d in d_const)  # something trained
    for dc, dw in zip(d_const, d_warm):
        np.testing.assert_allclose(dw, 0.25 * dc, rtol=5e-4, atol=1e-7)


def test_learner_fills_horizon_and_logs_lr(synth_root, tmp_path):
    from zsgnet_tpu.data.dataset import get_data
    from zsgnet_tpu.train.learner import Learner

    cfg = _tiny_cfg(synth_root, tmp_path, epochs=3,
                    lr_schedule="cosine", warmup_steps=2)
    data = get_data(cfg)
    learn = Learner("t_sched", data, cfg)
    assert learn.cfg.lr_decay_steps == 3 * len(data.train_dl)
    # Step 0, warmup 2 → the next update trains at lr/2.
    assert learn._effective_lr() == pytest.approx(cfg.lr / 2, rel=1e-6)

"""EMA of params (cfg.ema_decay) — formula exactness + integration.

Beyond-reference capability (standard detection-serving practice; the
reference evaluates raw weights only): the jitted train step maintains
ema = d_t·ema + (1-d_t)·params with the TF-detection warmup schedule
d_t = min(ema_decay, (1+t)/(10+t)). These tests verify

  * the update is EXACTLY that recurrence (host-side numpy recompute
    over a captured param trajectory), single-device and on the 8-way
    data mesh (EMA is a pure function of the param trajectory, which is
    itself sharded ≡ single-device — tests/test_parallel.py);
  * EMA is passive: enabling it does not change the param trajectory;
  * validate()/testing() evaluate the EMA weights (zeros-EMA state
    reproduces a zeros-params learner's metrics bit-for-bit);
  * checkpoints carry ema_params and every resume direction works
    (ema→ema continues the trajectory; ema→raw drops it; raw→ema
    re-seeds from the loaded weights);
  * Grounder.from_checkpoint serves the EMA weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.parallel.mesh import make_mesh
from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step

DECAY = 0.9


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ema_data")
    synthetic.generate(root, n_train=16, n_val=8, n_test=8, img_size=96)
    return root


def _cfg(root, tmp, **kw):
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=0, lr=1e-2,
        resize_img=(96, 96), max_qlen=8, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
        do_dist=False, tmp_path=str(tmp), opt_to_use="sgd", seed=3,
        mdl_to_use="ssd_vgg", ema_decay=DECAY,
    )
    base.update(kw)
    return Config(**base)


def _expected_decay(t: int) -> float:
    return min(DECAY, (1.0 + t) / (10.0 + t))


def _run_steps(cfg, data, n_steps: int):
    """Run n train steps; return (final state, [params after each step])."""
    batch = next(iter(data.train_dl))
    from zsgnet_tpu.parallel.train_step import train_batch_keys

    dev = {k: batch[k] for k in train_batch_keys(cfg)}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    mesh = make_mesh(cfg) if cfg.do_dist else None
    if mesh is not None:
        from zsgnet_tpu.parallel.mesh import batch_shardings, replicated_sharding

        shs = batch_shardings(mesh, cfg)
        dev = {k: jax.device_put(v, shs[k]) for k, v in dev.items()}
        rep = replicated_sharding(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
    step = make_train_step(cfg, anchor_pyramid_for(cfg), mesh)
    init_params = jax.device_get(state.params)
    trajectory = []
    for _ in range(n_steps):
        state, _ = step(state, dev)
        trajectory.append(jax.device_get(state.params))
    return state, init_params, trajectory


def _check_ema_matches_recurrence(state, init_params, trajectory):
    expected = init_params
    for t, params_t in enumerate(trajectory):
        d = _expected_decay(t)
        expected = jax.tree.map(
            lambda e, p: e * d + p * (1.0 - d), expected, params_t
        )
    got = jax.device_get(state.ema_params)
    flat_e, flat_g = jax.tree.leaves(expected), jax.tree.leaves(got)
    assert len(flat_e) == len(flat_g) > 0
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)


def test_ema_formula_exact_single_device(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path)
    data = get_data(cfg)
    state, init_params, traj = _run_steps(cfg, data, n_steps=4)
    _check_ema_matches_recurrence(state, init_params, traj)
    # Warmup engaged: after 4 steps the EMA is NOT the plain-decay value
    # (d_0..d_3 = 0.1..0.3 < 0.9), i.e. it has mostly forgotten the init.
    e0 = jax.tree.leaves(jax.device_get(state.ema_params))[0]
    p0 = jax.tree.leaves(jax.device_get(state.params))[0]
    i0 = jax.tree.leaves(init_params)[0]
    assert np.abs(e0 - p0).max() < np.abs(i0 - p0).max() or np.allclose(i0, p0)


@pytest.mark.slow
def test_ema_is_passive(synth_root, tmp_path):
    """Enabling EMA must not perturb the param trajectory."""
    cfg_on = _cfg(synth_root, tmp_path / "on")
    cfg_off = _cfg(synth_root, tmp_path / "off", ema_decay=0.0)
    data = get_data(cfg_on)
    s_on, _, _ = _run_steps(cfg_on, data, n_steps=2)
    s_off, _, _ = _run_steps(cfg_off, data, n_steps=2)
    assert s_off.ema_params is None
    for a, b in zip(
        jax.tree.leaves(jax.device_get(s_on.params)),
        jax.tree.leaves(jax.device_get(s_off.params)),
    ):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_ema_formula_exact_on_mesh(synth_root, tmp_path):
    cfg = _cfg(synth_root, tmp_path, do_dist=True, mesh_shape=(8,))
    data = get_data(cfg)
    state, init_params, traj = _run_steps(cfg, data, n_steps=2)
    _check_ema_matches_recurrence(state, init_params, traj)


def test_ema_formula_exact_grouped(synth_root, tmp_path):
    """EMA × grouped multi-query: the recurrence must hold unchanged when
    the step consumes grouped (B, Q, …) batches with pair_valid loss
    masking (EMA is a pure function of the param trajectory, so grouping
    must not perturb it beyond changing that trajectory's inputs)."""
    cfg = _cfg(synth_root, tmp_path, bs=4, queries_per_img=2)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    assert batch["qvec"].ndim == 3 and "pair_valid" in batch  # grouped path
    state, init_params, traj = _run_steps(cfg, data, n_steps=3)
    _check_ema_matches_recurrence(state, init_params, traj)


def test_validate_uses_ema_weights(synth_root, tmp_path):
    """A zeros-EMA learner's validate() == a zeros-PARAMS learner's
    validate(): proof the eval path reads ema_params, not params."""
    from zsgnet_tpu.train.learner import Learner

    cfg = _cfg(synth_root, tmp_path / "a", bs=4)
    data = get_data(cfg)
    learn = Learner("t_ema_eval", data, cfg)
    zeros = jax.tree.map(jnp.zeros_like, learn.state.params)
    learn.state = learn.state.replace(ema_params=zeros)
    m_ema = learn.validate()

    cfg2 = _cfg(synth_root, tmp_path / "b", bs=4, ema_decay=0.0)
    learn2 = Learner("t_ema_eval2", get_data(cfg2), cfg2)
    learn2.state = learn2.state.replace(
        params=jax.tree.map(jnp.zeros_like, learn2.state.params)
    )
    m_zero = learn2.validate()
    for k in ("Acc", "MaxPos"):
        assert m_ema[k] == m_zero[k], (k, m_ema, m_zero)


@pytest.mark.slow
def test_ema_checkpoint_roundtrip_and_grounder(synth_root, tmp_path):
    """fit → save → (ema→ema resume continues; ema→raw drops; raw→ema
    re-seeds) and Grounder.from_checkpoint serves the EMA weights."""
    from zsgnet_tpu.predict import Grounder
    from zsgnet_tpu.train.learner import Learner

    cfg = _cfg(synth_root, tmp_path, bs=4, epochs=1, log_every=1)
    data = get_data(cfg)
    learn = Learner("t_ema_ckpt", data, cfg)
    learn.fit(1)
    ema_saved = jax.device_get(learn.state.ema_params)
    params_saved = jax.device_get(learn.state.params)
    # Training moved params away from the EMA — the roundtrip checks
    # below distinguish the two trees.
    diffs = [
        np.abs(a - b).max()
        for a, b in zip(jax.tree.leaves(ema_saved), jax.tree.leaves(params_saved))
    ]
    assert max(diffs) > 0

    # ema→ema: the saved EMA trajectory continues.
    cfg_r = cfg.replace(resume=True)
    learn_r = Learner("t_ema_ckpt", get_data(cfg_r), cfg_r)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(learn_r.state.ema_params)),
        jax.tree.leaves(ema_saved),
    ):
        np.testing.assert_array_equal(a, b)

    # ema→raw: ema_decay=0 resume trains/serves raw params, EMA dropped.
    cfg_off = cfg.replace(resume=True, ema_decay=0.0)
    learn_off = Learner("t_ema_ckpt", get_data(cfg_off), cfg_off)
    assert learn_off.state.ema_params is None

    # Grounder serves the EMA weights (not the raw params).
    g = Grounder.from_checkpoint(learn.model_dir, batch_size=2)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(g.variables["params"])),
        jax.tree.leaves(ema_saved),
    ):
        np.testing.assert_array_equal(a, b)

    # raw→ema: resuming a non-EMA checkpoint re-seeds EMA from the
    # loaded weights.
    cfg_plain = _cfg(synth_root, tmp_path / "plain", bs=4, ema_decay=0.0,
                     epochs=1, log_every=1)
    learn_p = Learner("t_ema_plain", get_data(cfg_plain), cfg_plain)
    learn_p.fit(1)
    p_saved = jax.device_get(learn_p.state.params)
    cfg_seed = cfg_plain.replace(resume=True, ema_decay=DECAY)
    learn_s = Learner("t_ema_plain", get_data(cfg_seed), cfg_seed)
    for a, b in zip(
        jax.tree.leaves(jax.device_get(learn_s.state.ema_params)),
        jax.tree.leaves(p_saved),
    ):
        np.testing.assert_array_equal(a, b)

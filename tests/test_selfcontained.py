"""Self-contained checkpoint dirs + resume semantics (VERDICT r2 #2/#5/weak#7).

A checkpoint directory must be operable by a stranger: cfg.json + vocab.json
travel with the weights (the reference ships .pth + cfg.json together —
SURVEY.md §5 checkpoint row), so serving (Grounder), eval (main --only_val
--resume) and training resume all reconstruct the EXACT architecture from
the dir alone — no hand-reconstructed flags. Resume follows the reference's
budget semantics: fit(N) trains until epoch N total, not N more.
"""

import json

import jax
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.predict import Grounder
from zsgnet_tpu.train.learner import Learner

pytestmark = pytest.mark.slow  # every test trains/restores a Learner

# Deliberately NON-default architecture: restoring it from the bare dir is
# the point (a wrong head_ch fails on restore shapes; a wrong bn_variance
# would silently change semantics).
ARCH = dict(
    resize_img=(96, 96), lstm_dim=12, emb_dim=12, fpn_ch=24, head_ch=24,
    bn_variance="shifted",
)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    synthetic.generate(root, n_train=8, n_val=4, n_test=4, img_size=64)
    cfg = Config(
        ds_to_use="synthetic", data_dir=str(root), bs=4, nw=1, lr=1e-3,
        max_qlen=8, compute_dtype="float32", use_pallas=False,
        do_dist=False, tmp_path=str(root / "tmp"), epochs=1, log_every=1,
        **ARCH,
    )
    data = get_data(cfg)
    learn = Learner("t_selfc", data, cfg)
    learn.fit(1)
    return root, cfg, learn


def test_sidecars_written(trained):
    root, cfg, learn = trained
    saved = json.loads((learn.model_dir / "cfg.json").read_text())
    for k, v in ARCH.items():
        got = tuple(saved[k]) if isinstance(saved[k], list) else saved[k]
        assert got == v, f"cfg.json lost {k}: {got} != {v}"
    assert saved["vocab_size"] == len(learn.data.vocab)
    assert (learn.model_dir / "vocab.json").exists()


def test_grounder_from_bare_dir(trained):
    """No cfg, no vocab_path — everything from the dir."""
    root, cfg, learn = trained
    g = Grounder.from_checkpoint(learn.model_dir, batch_size=2)
    for k, v in ARCH.items():
        assert getattr(g.cfg, k) == v
    img = root / "synthetic" / "images" / "train_00000.png"
    (res,) = g.ground([img], ["the red box"])
    assert 0 <= res["score"] <= 1 and len(res["box_xyxy"]) == 4


def test_main_resume_from_bare_dir(trained):
    """main --only_val --resume with NO architecture flags must reproduce
    the trained model's own validation metrics."""
    from zsgnet_tpu.main import main_dist

    root, cfg, learn = trained
    want = learn.validate()
    got = main_dist(
        "t_selfc", resume=True, only_val=True, tmp_path=cfg.tmp_path,
        compute_dtype="float32", use_pallas=False, do_dist=False, nw=1,
    )
    np.testing.assert_allclose(got["MeanIoU"], want["MeanIoU"], atol=1e-5)
    np.testing.assert_allclose(got["Acc"], want["Acc"], atol=1e-9)


def test_resume_budget_semantics(trained):
    """fit(N) is a TOTAL epoch budget across resumes (VERDICT r2 #5)."""
    root, cfg, learn = trained
    assert learn.epoch == 1  # fixture ran fit(1)

    resumed = Learner("t_selfc", learn.data, cfg.replace(resume=True))
    assert resumed.epoch == 1
    step_before = int(resumed.state.step)
    resumed.fit(1)  # budget already reached → no training
    assert int(resumed.state.step) == step_before
    resumed.fit(2)  # one MORE epoch (2 total), not two
    assert resumed.epoch == 2
    steps_per_epoch = len(learn.data.train_dl)
    assert int(resumed.state.step) == step_before + steps_per_epoch


def test_plateau_state_roundtrip(trained):
    """Plateau best/num_bad persist: a resume right before an LR drop must
    keep its bad-epoch count (VERDICT r2 weak #7)."""
    root, cfg, learn = trained
    fresh = Learner("t_plateau", learn.data, cfg)  # own dir — isolated steps
    fresh.overfit_batch(steps=1)
    fresh.plateau.best = 0.75
    fresh.plateau.num_bad = 2
    fresh._lr_scale_host = 0.1
    fresh.plateau.scale = 0.1
    fresh.save_model_dict()

    resumed = Learner("t_plateau", learn.data, cfg.replace(resume=True))
    assert resumed.plateau.best == pytest.approx(0.75)
    assert resumed.plateau.num_bad == 2
    assert resumed.plateau.scale == pytest.approx(0.1)
    assert float(resumed.state.lr_scale) == pytest.approx(0.1)


def test_mesh_elastic_restore(tmp_path_factory):
    """Checkpoints are mesh-elastic: a run trained over the 8-shard data
    mesh restores on a single device (and keeps training) with identical
    metrics — a pod checkpoint must be debuggable on one chip, and a
    one-chip warm start must scale out. Orbax stores replicated arrays
    host-local, so restore targets any device layout."""
    root = tmp_path_factory.mktemp("el_data")
    synthetic.generate(root, n_train=16, n_val=8, n_test=4, img_size=64)
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=1, lr=1e-3,
        max_qlen=8, compute_dtype="float32", use_pallas=False,
        tmp_path=str(root / "tmp"), epochs=1, log_every=1,
        resize_img=(64, 64), lstm_dim=12, emb_dim=12, fpn_ch=24, head_ch=24,
    )
    cfg8 = Config(do_dist=True, **base)
    data8 = get_data(cfg8)
    learn8 = Learner("t_elastic", data8, cfg8)
    learn8.fit(1)
    m8 = learn8.validate()

    # 8-shard checkpoint → single device: metrics must reproduce exactly.
    cfg1 = Config(do_dist=False, resume=True, **base)
    data1 = get_data(cfg1)
    learn1 = Learner("t_elastic", data1, cfg1)
    assert learn1.epoch == 1
    m1 = learn1.validate()
    np.testing.assert_allclose(m1["MeanIoU"], m8["MeanIoU"], atol=1e-5)
    np.testing.assert_allclose(m1["Acc"], m8["Acc"], atol=1e-9)

    # ...and training continues on the new layout (epoch budget 2 total).
    learn1.fit(2)
    assert learn1.epoch == 2

    # single-device checkpoint → back onto the mesh, one more epoch.
    learn_back = Learner("t_elastic", data8, cfg8.replace(resume=True))
    assert learn_back.epoch == 2
    mb = learn_back.validate()
    m1b = learn1.validate()
    np.testing.assert_allclose(mb["MeanIoU"], m1b["MeanIoU"], atol=1e-5)
    learn_back.fit(3)
    assert learn_back.epoch == 3


def test_pre_r3_checkpoint_format_loads(trained, tmp_path_factory):
    """Format-compat regression fixture (VERDICT r3 #9): a checkpoint
    written with the FROZEN pre-r3 payload — params/batch_stats/opt_state/
    step/epoch/best_metric/lr_scale only, NO plateau keys, NO ema_params,
    NO epoch_batches — must load with fresh counters as load_model_dict
    claims, even into an EMA-enabled Learner (re-seeds EMA from params).
    This payload dict is the fixture: it stays frozen here as
    save_model_dict grows keys."""
    from zsgnet_tpu.train.checkpoint import CheckpointManager

    root, cfg, learn = trained
    old_dir = tmp_path_factory.mktemp("pre_r3_ckpt")
    # ---- frozen pre-r3 writer (do NOT add keys here) ----
    payload = {
        "params": learn.state.params,
        "batch_stats": learn.state.batch_stats,
        "opt_state": learn.state.opt_state,
        "step": int(learn.state.step),
        "epoch": 1,
        "best_metric": 0.25,
        "lr_scale": 0.5,
    }
    mngr = CheckpointManager(old_dir)
    mngr.save(int(learn.state.step), payload)
    mngr.wait()
    # ----------------------------------------------------
    data = get_data(cfg)
    for ema in (0.0, 0.99):  # plain + EMA-enabled loader
        learn2 = Learner("t_pre_r3", data, cfg.replace(ema_decay=ema))
        learn2.load_model_dict(path=str(old_dir))
        assert int(learn2.state.step) == int(learn.state.step)
        assert learn2.epoch == 1 and learn2.best_metric == 0.25
        assert float(learn2.state.lr_scale) == 0.5
        # missing keys → fresh counters (the documented claim)
        assert learn2.plateau.best == float("-inf")
        assert learn2.plateau.num_bad == 0
        assert learn2.plateau.scale == 0.5  # absorbed from lr_scale
        assert learn2._resume_batches == 0
        a = np.asarray(
            next(iter(jax.tree_util.tree_leaves(learn.state.params)))
        )
        b = np.asarray(
            next(iter(jax.tree_util.tree_leaves(learn2.state.params)))
        )
        np.testing.assert_array_equal(a, b)
        if ema:
            # EMA re-seeded from the loaded params (pre-EMA checkpoint)
            e = np.asarray(
                next(iter(jax.tree_util.tree_leaves(learn2.state.ema_params)))
            )
            np.testing.assert_array_equal(e, b)

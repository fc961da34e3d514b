"""GSPMD spatial partitioning (cfg.mesh_spatial) on the 8-device CPU mesh.

The 2-D (data, spatial) mode jits the global-semantics step with the
image height sharded over the spatial axis — XLA's SPMD partitioner
inserts the conv halo exchanges and moment/grad reductions, so one
sample's activations (the 600² HBM limiter) spread over chips. DDP has
no counterpart (SURVEY.md §2 item 11 — beyond-reference capability).

Correctness bar: the partitioned step computes the SAME global math as
one device — equality up to fp32 reduction-order (partitioned psums).
"""

import jax
import numpy as np
import pytest

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.parallel.mesh import batch_shardings, is_spatial_mesh, make_mesh
from zsgnet_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sp_data")
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


def test_spatial_mesh_shape():
    cfg = Config(mesh_spatial=4)
    mesh = make_mesh(cfg)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "spatial")
    assert is_spatial_mesh(mesh, cfg)
    assert not is_spatial_mesh(make_mesh(Config()), cfg)
    shs = batch_shardings(mesh, cfg)
    assert shs["img"].spec == ("data", "spatial")
    assert shs["annot"].spec == ("data",)


def test_spatial_mesh_rejects_oversubscription():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(Config(mesh_spatial=16))


def test_spatial_train_step_exact_on_bn_free_ssd(synth_root, tmp_path):
    """(data=2, spatial=4) GSPMD step == single-device step on SSD-VGG
    (no BatchNorm). Loss matches to 1e-5; post-SGD params to 5e-4 abs —
    conv-weight grads are sums over B×H×W ≈ 74k partitioned terms, and
    fp32 reassociation of the partitioner's partial sums reaches ~1.6e-4
    on ~0.2% of elements (measured; loss-level agreement pins the math)."""
    cfg1 = _cfg(synth_root, tmp_path, mdl_to_use="ssd_vgg")
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


@pytest.mark.slow  # ~60s compile; fast reps: canvas equality (test_model), ssd gspmd exact above
def test_canvas_head_gspmd_spatial_exact_ssd(synth_root, tmp_path):
    """head_canvas × GSPMD spatial (SSD-VGG + uniform proj, (2, 4)
    mesh): the zero-separated canvas pack (models/canvas.py `.at[].set`
    scatters + border masks) must partition exactly under the sharded
    image height — same bar as test_spatial_train_step_exact_on_bn_free_ssd.
    A trace-time spy proves the canvas branch actually engaged (it needs
    uniform channels; a silently-skipped canvas would make this test
    vacuous). Closes the last untested head-layout × spatial cell."""
    from unittest import mock

    from zsgnet_tpu.models import canvas as canvas_mod

    cfg1 = _cfg(synth_root, tmp_path, mdl_to_use="ssd_vgg",
                ssd_uniform_proj=True, head_canvas=True)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    with mock.patch.object(
        canvas_mod, "pack_levels", wraps=canvas_mod.pack_levels
    ) as spy:
        s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
        ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)
    assert spy.called, "canvas head did not engage (same_ch gate?)"

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


@pytest.mark.slow  # ~60s compile; fast reps: canvas equality (test_model), ssd gspmd exact above
def test_canvas_head_halo_spatial_matches_single_device(synth_root, tmp_path):
    """head_canvas × halo spatial (retina, (2, 4) mesh, spatial_mode
    auto → halo): the canvas head runs AFTER the all_to_all reshard on
    batch-sharded full-height features, so it must land inside the same
    fp32 envelope as the per-level head
    (test_halo_train_step_matches_single_device's bar)."""
    from unittest import mock

    from zsgnet_tpu.models import canvas as canvas_mod

    cfg1 = _cfg(synth_root, tmp_path, head_canvas=True)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    with mock.patch.object(
        canvas_mod, "pack_levels", wraps=canvas_mod.pack_levels
    ) as spy:
        s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
        ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)
    assert spy.called, "canvas head did not engage (same_ch gate?)"

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]), rtol=1e-4)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.slow  # ~60s compile; the handled-fallback path needs one proof
def test_spd_stem_halo_spatial_matches_single_device(synth_root, tmp_path):
    """spd_stem × halo spatial (retina): the SPD stem has no halo
    variant by design — models/resnet.py reshards to batch-split mode
    before the stem ("not worth a halo variant") — so the whole step
    must still equal single-device within the halo fp32 envelope.
    Proves the documented fallback rather than trusting the comment."""
    cfg1 = _cfg(synth_root, tmp_path, spd_stem=True)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]), rtol=1e-4)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_spatial_gspmd_mode_gated_for_retina(synth_root, tmp_path):
    """Retina×spatial GSPMD TRAINING stays gated: jax 0.9's SPMD
    partitioner mis-compiles the grad of the ResNet+FPN forward under a
    height-sharded image. Measured (tools/check_spatial_gspmd.py): the
    forward-only train-mode loss matches single-device to 2e-5 (BN batch
    moments to 2.5e-5 — halos and partitioned reductions are fine), but
    the SAME forward inside value_and_grad shifts +8e-3 and gradients
    come out 1.5× (data=2,spatial=4) to 22× (data=4,spatial=2) the true
    gradient norm — layout-dependent, so a compiler bug, not reduction
    order. BN-formulation dodges all fail (fast/shifted variance, frozen
    BN, remat). spatial_mode='gspmd' must refuse rather than train
    wrong; the default 'auto' routes retina through the manual halo path
    (parallel/halo.py) which bypasses the partitioner entirely."""
    cfg_sp = _cfg(synth_root, tmp_path, do_dist=True, mesh_spatial=4,
                  spatial_mode="gspmd")
    anchors = anchor_pyramid_for(cfg_sp)
    mesh = make_mesh(cfg_sp)
    with pytest.raises(NotImplementedError, match="retina"):
        make_train_step(cfg_sp, anchors, mesh=mesh)
    # And halo mode is retina-only: ssd_vgg already trains exactly
    # under GSPMD, so a halo request there is a config error.
    cfg_ssd = _cfg(synth_root, tmp_path, do_dist=True, mesh_spatial=4,
                   spatial_mode="halo", mdl_to_use="ssd_vgg")
    with pytest.raises(NotImplementedError, match="retina only"):
        make_train_step(cfg_ssd, anchor_pyramid_for(cfg_ssd), mesh=make_mesh(cfg_ssd))


def test_halo_backbone_grads_exact_fp64():
    """THE correctness claim for the manual halo path (VERDICT r3 #2):
    grads of the height-sharded ResNet50 (stem 7×7 halo, -inf-filled
    maxpool halo, bottleneck 3×3 halos incl. stride-2, the mid-network
    all_to_all reshard, multi-tap C3/C4/C5, train-mode sync-BN over both
    mesh axes) equal the single-device grads to 1e-9 rel in float64 —
    algebraic exactness, not a tolerance budget.

    Measured context for fp32 expectations elsewhere: at random init the
    fp32 single-device grads are THEMSELVES ~3.5% rel-L2 from the fp64
    oracle on the worst train-mode BN bias (deep normalization-chain
    conditioning), and the fp32 halo run is CLOSER to the oracle (0.7%)
    than fp32 single-device is. fp32 sharded-vs-single comparisons must
    therefore budget ~4e-2 on worst BN leaves — that is conditioning,
    not implementation error, and THIS test is what pins the math."""
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from zsgnet_tpu.models.resnet import ResNet50
    from zsgnet_tpu.parallel.halo import SpatialCtx

    S = 4
    mesh = Mesh(np.array(jax.devices()[:S]).reshape(1, S), ("data", "spatial"))
    ctx = SpatialCtx("spatial", S)
    with jax.enable_x64(True):
        # H=64, S=4: stem 64→32, pool→16, layer2→8, layer3→4 local 1,
        # layer4 would need 4%2 rows/shard → resharded mid-net; covers
        # every structural piece at (1,1,1,1) depth.
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 32, 3), jnp.float64)
        m0 = ResNet50(dtype=jnp.float64, bn_variance="exact", stage_sizes=(1, 1, 1, 1))
        ms = ResNet50(dtype=jnp.float64, bn_variance="exact", stage_sizes=(1, 1, 1, 1),
                      bn_axis=("data", "spatial"))
        v = m0.init(jax.random.PRNGKey(1), x[:1], False)
        params = jax.tree.map(lambda t: t.astype(jnp.float64), v["params"])
        stats = jax.tree.map(lambda t: t.astype(jnp.float64), v["batch_stats"])

        def loss_single(p):
            feats, _ = m0.apply({"params": p, "batch_stats": stats}, x, True,
                                mutable=["batch_stats"])
            return sum(jnp.sum(f ** 2) for f in feats)

        g1 = jax.jit(jax.grad(loss_single))(params)

        def local(xl):
            def loss(p):
                (feats, flags), _ = ms.apply(
                    {"params": p, "batch_stats": stats}, xl, True,
                    spatial=ctx, mutable=["batch_stats"],
                )
                feats = [ctx.reshard(f) if fl else f for f, fl in zip(feats, flags)]
                return sum(jnp.sum(f ** 2) for f in feats)

            g = jax.grad(loss)(params)
            return jax.tree.map(lambda t: lax.psum(t, ("data", "spatial")), g)

        gsp = jax.jit(
            shard_map(local, mesh=mesh, in_specs=P(None, "spatial"),
                      out_specs=P(), check_vma=False)
        )(x)
        for (k1, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g1), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(gsp), key=str),
        ):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
            assert rel < 1e-9, f"{jax.tree_util.keystr(k1)}: rel {rel}"


@pytest.mark.slow
def test_halo_train_step_matches_single_device(synth_root, tmp_path):
    """Full retina train step under the (2, 4) mesh (spatial_mode auto →
    halo): loss matches single-device to 1e-4, num_pos exactly. Post-SGD
    params carry the fp32 BN-conditioning envelope measured against the
    fp64 oracle (see test_halo_backbone_grads_exact_fp64): worst grad
    leaves differ ~4e-2 rel between two equally-valid fp32 reduction
    orders, so at lr=1e-2 params get atol 5e-3 — the fp64 test is the
    exactness proof, this one pins the end-to-end wiring (loss variants,
    annotation slicing, psums over both axes, optimizer)."""
    cfg1 = _cfg(synth_root, tmp_path)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]), rtol=1e-4)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_halo_composes_with_grad_accum(synth_root, tmp_path):
    """grad_accum=2 under the halo (2, 4) mesh equals grad_accum=2 on
    the 1-D (data=2) sync-BN shard_map mesh — the comparison that keeps
    the BN microbatch semantics IDENTICAL on both sides: retina has
    BatchNorm, grad_accum moments are per-microbatch by documented
    design (Config.grad_accum), and a per-shard microbatch is rows
    [i·4:(i+1)·4] of each data shard in both layouts, with moments
    synced globally (bn_sync_axis on the 1-D side, forced both-axes
    sync on the halo side). The halo path keeps the lax.scan microbatch
    loop — the scan miscompile was GSPMD-specific. bs=16: each
    microbatch (16 / data=2 / k=2 = 4) must divide mesh_spatial for
    the reshard's batch split."""
    cfg1 = _cfg(synth_root, tmp_path, bs=16, grad_accum=2, do_dist=True,
                mesh_shape=(2,), bn_sync_axis="data")
    cfg_sp = cfg1.replace(mesh_spatial=4, mesh_shape=(-1,), bn_sync_axis="")
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh1 = make_mesh(cfg1)
    mesh = make_mesh(cfg_sp)
    assert mesh1.devices.shape == (2,) and mesh.devices.shape == (2, 4)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=mesh1)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.slow  # Slow tier (r5): spatial-eval fast coverage stays via
    # test_learner_eval_only_retina_on_spatial_mesh.
def test_spatial_eval_step_matches_single_device(synth_root, tmp_path):
    cfg1 = _cfg(synth_root, tmp_path)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state, dev = _state_and_batch(cfg1, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    # Eval batches carry the tail-pad mask (loaders always emit it;
    # eval_batch_keys) — all-ones here, so the loss is the unmasked one.
    dev_ev = dict(dev, valid=np.ones(dev["img"].shape[0], bool))
    ev1 = make_eval_step(cfg1, anchors, mesh=None)(state, dev_ev)
    evsp = make_eval_step(cfg_sp, anchors, mesh=mesh)(state, dev_ev)

    np.testing.assert_allclose(np.asarray(ev1["iou"]), np.asarray(evsp["iou"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ev1["correct"]),
                                  np.asarray(evsp["correct"]))
    np.testing.assert_allclose(np.asarray(ev1["loss"]), np.asarray(evsp["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_spatial_composes_with_grad_accum(synth_root, tmp_path):
    """grad_accum=2 under the (2, 4) mesh still equals the one-shot
    single-device step on the BN-free SSD path (exact protocol).

    Regression guard for a second jax-0.9 GSPMD bug: grad-of-``lax.scan``
    over sharded microbatches mis-partitions the forward (per-microbatch
    losses came out 6.427 vs the true 5.547; grads 7.5× off l2), while
    the forward-only scan and the unrolled loop are both exact —
    grads_accumulated therefore unrolls under a spatial mesh."""
    cfg1 = _cfg(synth_root, tmp_path, mdl_to_use="ssd_vgg")
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4, grad_accum=2)
    data = get_data(cfg1)
    state1, dev = _state_and_batch(cfg1, data)
    state_sp, _ = _state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]),
                               rtol=1e-4)
    # Reassociation envelope: k microbatch partial-sums × the partitioned
    # grad reduction (measured worst element 5.1e-4; loss pins the math).
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_learner_eval_only_retina_on_spatial_mesh(synth_root, tmp_path):
    """Eval-only retina × spatial works (GSPMD forward is exact), and
    the Learner's train step is built LAZILY — under the explicit
    'gspmd' training mode, construction + validate() succeed and only
    touching .train_step raises (the measured grad miscompile gate).
    Under the default 'auto' the train step now builds fine (halo)."""
    from zsgnet_tpu.train.learner import Learner

    cfg = _cfg(synth_root, tmp_path, do_dist=True, mesh_spatial=4, nw=0,
               spatial_mode="gspmd")
    data = get_data(cfg)
    learn = Learner("t_spatial_eval", data, cfg)
    m = learn.validate()
    assert np.isfinite(m["loss"]) and "Acc" in m
    with pytest.raises(NotImplementedError, match="retina"):
        _ = learn.train_step


@pytest.mark.slow
def test_learner_fit_retina_on_spatial_mesh(synth_root, tmp_path):
    """Full Learner loop (fit 1 epoch → validate) for RETINA with
    cfg.mesh_spatial=4 — the capability VERDICT r3 #2 demanded: the
    flagship backbone training spatially-partitioned, via the manual
    halo shard_map path (spatial_mode auto), on the (2, 4) CPU mesh."""
    from zsgnet_tpu.train.learner import Learner

    cfg = _cfg(synth_root, tmp_path, do_dist=True, mesh_spatial=4,
               epochs=1, nw=0, log_every=1)
    data = get_data(cfg)
    learn = Learner("t_spatial_halo", data, cfg)
    assert learn.mesh is not None and learn.mesh.devices.shape == (2, 4)
    learn.fit(1)
    m = learn.validate()
    assert np.isfinite(m["loss"]) and "Acc" in m and "MaxPos" in m


@pytest.mark.slow
def test_learner_fit_on_spatial_mesh(synth_root, tmp_path):
    """Full Learner loop (fit 1 epoch → validate) with cfg.mesh_spatial=4:
    make_mesh builds the (2, 4) mesh, _shard places the image
    P(data, spatial), and both steps run GSPMD-partitioned — the exact
    `main --mesh_spatial=4 --mdl_to_use=ssd_vgg` user path (retina
    training is gated under spatial, see test_spatial_train_gated_for_retina)."""
    from zsgnet_tpu.train.learner import Learner

    cfg = _cfg(synth_root, tmp_path, do_dist=True, mesh_spatial=4,
               mdl_to_use="ssd_vgg", epochs=1, nw=0, log_every=1)
    data = get_data(cfg)
    learn = Learner("t_spatial", data, cfg)
    assert learn.mesh is not None and learn.mesh.devices.shape == (2, 4)
    learn.fit(1)
    m = learn.validate()
    assert np.isfinite(m["loss"]) and "Acc" in m and "MaxPos" in m


# ---------------------------------------------------------------------------
# Grouped multi-query × spatial partitioning (VERDICT r4 missing #3: the
# composition matrix). Same equality bar as the flat spatial tests.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synth_grouped_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sp_grp_data")
    synthetic.generate(root, n_train=16, n_val=8, n_test=8, img_size=96,
                       all_objects=True)
    return root


def _grouped_state_and_batch(cfg, data, key=0):
    from zsgnet_tpu.parallel.train_step import train_batch_keys

    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in train_batch_keys(cfg)}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(key))
    return state, dev


def test_grouped_halo_spatial_matches_single_device(synth_grouped_root, tmp_path):
    """Grouped multi-query (Q=2) × halo spatial training (retina, (2, 4)
    mesh): the composition slices qvec/annot/pair_valid per spatial
    member after the backbone reshard (parallel/halo.py slice_batch) and
    broadcasts Q phrases through the head — must equal the same grouped
    step on one device within the halo fp32 envelope
    (test_halo_train_step_matches_single_device's bar)."""
    cfg1 = _cfg(synth_grouped_root, tmp_path, queries_per_img=2)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _grouped_state_and_batch(cfg1, data)
    assert dev["qvec"].ndim == 3 and "pair_valid" in dev
    state_sp, _ = _grouped_state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]), rtol=1e-4)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_grouped_gspmd_spatial_exact_ssd(synth_grouped_root, tmp_path):
    """Grouped multi-query (Q=2) × GSPMD spatial training (SSD-VGG,
    (2, 4) mesh): the partitioner shards the per-IMAGE height while the
    loss runs over B·Q flattened pairs with the wrap-repeat mask — must
    equal the same grouped step on one device at the BN-free exactness
    bar (test_spatial_train_step_exact_on_bn_free_ssd's tolerances)."""
    cfg1 = _cfg(synth_grouped_root, tmp_path, mdl_to_use="ssd_vgg",
                queries_per_img=2)
    cfg_sp = cfg1.replace(do_dist=True, mesh_spatial=4)
    data = get_data(cfg1)
    state1, dev = _grouped_state_and_batch(cfg1, data)
    state_sp, _ = _grouped_state_and_batch(cfg_sp, data)
    anchors = anchor_pyramid_for(cfg1)
    mesh = make_mesh(cfg_sp)

    s1, ls1 = make_train_step(cfg1, anchors, mesh=None)(state1, dev)
    ssp, lssp = make_train_step(cfg_sp, anchors, mesh=mesh)(state_sp, dev)

    np.testing.assert_allclose(float(ls1["total"]), float(lssp["total"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ls1["num_pos"]), float(lssp["num_pos"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(ssp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)

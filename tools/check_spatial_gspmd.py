"""Reproduce the two jax-0.9 GSPMD partitioner bugs that shape
``cfg.mesh_spatial`` support — rerun on every jax upgrade to re-evaluate
the gates in ``parallel/train_step.py`` (docs/DESIGN.md "Two parallelism
modes").

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/check_spatial_gspmd.py

Checks (each prints PASS/BUG against the single-device reference):

1. **grad-of-scan** (SSD-VGG, BN-free, fp32): a ``lax.scan`` over
   GSPMD-sharded microbatches inside ``value_and_grad`` mis-partitions
   the FORWARD — measured per-microbatch losses 6.427 vs the true 5.547,
   grads 7.5× off l2, while the forward-only scan and the unrolled loop
   are exact and ``with_sharding_constraint`` in the body does not help.
   Handled: ``grads_accumulated`` unrolls microbatches under a spatial
   mesh. If this check passes on a future jax, the unroll can revert.

2. **grad-of-ResNet+FPN** (retina): with the image height sharded
   P('data', 'spatial'), the ungradded train-mode forward matches
   single-device to 2e-5 (BN batch moments to 2.5e-5), but the SAME
   forward inside ``value_and_grad`` shifts its loss ~+8e-3 and produces
   gradients 1.5×/22× the true norm depending on mesh layout
   ((2,4)/(4,2)) — layout-dependent ⇒ compiler, not reduction order.
   Formulation dodges all fail (fast/shifted BN variance, frozen BN,
   remat). Handled: retina spatial TRAINING raises in
   ``make_train_step``. If this check passes on a future jax, drop the
   gate.

Reference parity note: the upstream repo has no spatial-partitioning
counterpart (DDP cannot split one sample); this is a beyond-reference
capability, so the gates bound only our own feature surface.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# 8 virtual CPU devices, like tests/conftest.py (the env var alone is not
# enough — the axon sitecustomize overrides JAX_PLATFORMS; see SKILL.md).
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from zsgnet_tpu.config import Config
from zsgnet_tpu.data import synthetic
from zsgnet_tpu.data.dataset import get_data
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.parallel.mesh import batch_shardings, make_mesh
from zsgnet_tpu.parallel.train_step import create_train_state, make_compute_loss


def _setup(**kw):
    root = Path(tempfile.mkdtemp())
    synthetic.generate(root, n_train=16, n_val=8, n_test=8, img_size=96)
    base = dict(
        ds_to_use="synthetic", data_dir=str(root), bs=8, nw=0, lr=1e-2,
        resize_img=(96, 96), max_qlen=8, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, compute_dtype="float32", use_pallas=False,
        do_dist=False, tmp_path=tempfile.mkdtemp(), opt_to_use="sgd", seed=3,
    )
    base.update(kw)
    cfg = Config(**base)
    data = get_data(cfg)
    batch = next(iter(data.train_dl))
    dev = {k: batch[k] for k in ("img", "qvec", "qlens", "annot")}
    model = get_default_net(cfg, vocab_size=len(data.vocab))
    state = create_train_state(cfg, model, dev, jax.random.PRNGKey(0))
    return cfg, dev, model, state


def _g_rel(g_ref, g):
    gn = np.sqrt(sum(float((np.asarray(x, np.float64) ** 2).sum())
                     for x in jax.tree.leaves(g_ref)))
    d = np.sqrt(sum(
        float(((np.asarray(x, np.float64) - np.asarray(y, np.float64)) ** 2).sum())
        for x, y in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g))))
    return d / gn


def check_grad_of_scan() -> bool:
    """Bug 1: scan-over-sharded-microbatches inside value_and_grad (SSD)."""
    cfg, dev, model, state = _setup(mdl_to_use="ssd_vgg", mesh_spatial=2,
                                    grad_accum=2, do_dist=True)
    anchors = anchor_pyramid_for(cfg)
    mesh = make_mesh(cfg)  # (4, 2) on 8 devices
    compute_loss = make_compute_loss(cfg, anchors, None)
    k = 2

    def loss_fn(params, b):
        out = model.apply({"params": params},
                          {kk: b[kk] for kk in ("img", "qvec", "qlens", "annot")},
                          train=True)
        return compute_loss(out, b["annot"])["total"]

    def accum_scan(params, b):
        micro = jax.tree.map(
            lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]), b)
        grad_fn = jax.value_and_grad(loss_fn)

        def body(c, mb):
            t, g = grad_fn(params, mb)
            return (c[0] + t, jax.tree.map(jnp.add, c[1], g)), t

        g0 = jax.tree.map(jnp.zeros_like, params)
        (t_sum, g), ys = jax.lax.scan(body, (jnp.zeros(()), g0), micro)
        return t_sum, g, ys

    repl_1 = jax.device_put(state.params)
    t_ref, g_ref, ys_ref = jax.jit(accum_scan)(repl_1, jax.device_put(dev))

    shs = batch_shardings(mesh, cfg)
    b_sp = {kk: jax.device_put(v, shs[kk]) for kk, v in dev.items()}
    repl = NamedSharding(mesh, P())
    t_sp, g_sp, ys_sp = jax.jit(accum_scan, in_shardings=(repl, shs))(
        jax.device_put(state.params, repl), b_sp)

    dy = float(np.abs(np.asarray(ys_ref) - np.asarray(ys_sp)).max())
    rel = _g_rel(g_ref, g_sp)
    bug = dy > 1e-3 or rel > 1e-2
    print(f"[1] grad-of-scan (SSD, mesh (4,2)): "
          f"max per-microbatch loss diff={dy:.3e}, grad rel-l2={rel:.3g} -> "
          f"{'BUG (keep the unroll in grads_accumulated)' if bug else 'PASS (unroll can revert)'}")
    return not bug


def check_grad_of_retina() -> bool:
    """Bug 2: value_and_grad of the ResNet+FPN forward, height sharded."""
    cfg, dev, model, state = _setup()
    anchors = anchor_pyramid_for(cfg)
    compute_loss = make_compute_loss(cfg, anchors, None)

    def loss_fn(params, stats, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": stats},
            {kk: b[kk] for kk in ("img", "qvec", "qlens", "annot")},
            train=True, mutable=["batch_stats"])
        return compute_loss(out, b["annot"])["total"]

    vag = jax.value_and_grad(loss_fn)
    t_ref, g_ref = jax.jit(vag)(state.params, state.batch_stats,
                                jax.device_put(dev))

    ok = True
    for sp in (4, 2):  # (data=2, spatial=4) and (data=4, spatial=2)
        c = cfg.replace(do_dist=True, mesh_spatial=sp)
        mesh = make_mesh(c)
        shs = batch_shardings(mesh, c)
        b = {kk: jax.device_put(v, shs[kk]) for kk, v in dev.items()}
        repl = NamedSharding(mesh, P())
        t, g = jax.jit(vag, in_shardings=(repl, repl, shs))(
            state.params, state.batch_stats, b)
        dt = abs(float(t) - float(t_ref))
        rel = _g_rel(g_ref, g)
        bug = dt > 1e-4 or rel > 1e-2
        ok &= not bug
        print(f"[2] grad-of-retina (mesh {mesh.shape}): "
              f"loss diff={dt:.3e}, grad rel-l2={rel:.3g} -> "
              f"{'BUG (keep the retina gate)' if bug else 'PASS'}")
    if ok:
        print("[2] both layouts clean -> the retina spatial-training gate "
              "in make_train_step can be dropped")
    return ok


if __name__ == "__main__":
    n = jax.device_count()
    if n < 8:
        raise SystemExit(
            f"need 8 devices (have {n}): run with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    print(f"jax {jax.__version__}, {n} {jax.devices()[0].platform} devices")
    check_grad_of_scan()
    check_grad_of_retina()

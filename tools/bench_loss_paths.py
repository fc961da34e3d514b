"""Loss-path shootout on the real TPU — level (XLA) vs Pallas-flat vs jnp-flat.

VERDICT r1 #2: the Pallas fused loss must run COMPILED on hardware with an
equality assert against the level path, and BASELINE.md gets per-path ms
from the chip. Three implementations of the same math (focal + smooth-L1
over matched anchors, SURVEY.md §3.4):

  level   — ops.level_ops.zsg_loss_levels on native (B,H,W,A) conv outputs
  pallas  — ops.pallas.fused_loss.zsg_loss_fused on flat (B,ΣHWA) tensors
  jnp     — ops.losses.zsg_loss + match_and_encode on flat tensors

Timed as value+grad (the training-step usage) with scalar-fetch-closed
loops (the axon tunnel makes block_until_ready unreliable — see
.claude/skills/verify/SKILL.md). 'flatten+' variants include the
NHWC→flat relayout a real train step would pay to feed the flat kernels.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.models.zsgnet import anchor_components_for, anchor_pyramid_for
from zsgnet_tpu.ops import anchors as anchor_ops
from zsgnet_tpu.ops import losses
from zsgnet_tpu.ops.level_ops import zsg_loss_levels
from zsgnet_tpu.ops.pallas.fused_loss import pack_anchors, zsg_loss_fused

B = 64
cfg = get_default_cfg()
print(f"devices: {jax.devices()}  B={B} resize={cfg.resize_img}")

rng = np.random.default_rng(0)
comps = anchor_components_for(cfg)
anchors = anchor_pyramid_for(cfg)
A = anchors.shape[0]
a_per = cfg.num_anchors
sizes = [(c["cy"].shape[0], c["cy"].shape[1]) for c in comps]
print(f"anchors: {A} over levels {sizes}")

att_levels = tuple(
    jnp.asarray(rng.normal(size=(B, h, w, a_per)).astype(np.float32)) for h, w in sizes
)
delta_levels = tuple(
    tuple(jnp.asarray(rng.normal(size=(B, h, w, a_per)).astype(np.float32) * 0.1)
          for _ in range(4))
    for h, w in sizes
)
# gt boxes: random valid tlbr in [-1, 1]
c = rng.uniform(-0.5, 0.5, size=(B, 2))
e = rng.uniform(0.1, 0.7, size=(B, 2))
gt = np.stack([c[:, 0] - e[:, 0], c[:, 1] - e[:, 1],
               c[:, 0] + e[:, 0], c[:, 1] + e[:, 1]], -1).astype(np.float32)
gt = jnp.asarray(gt)

anchors_c = jnp.asarray(anchors)
anchors_packed = jnp.asarray(pack_anchors(anchors))
kw = dict(lamb_reg=cfg.lamb_reg, match_thr=cfg.matching_threshold,
          neg_thr=cfg.neg_threshold, alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)


def flatten(att_l, del_l):
    att = jnp.concatenate([a.reshape(a.shape[0], -1) for a in att_l], axis=1)
    bbx = jnp.concatenate(
        [jnp.stack([d.reshape(d.shape[0], -1) for d in dl], axis=-1) for dl in del_l],
        axis=1,
    )
    return att, bbx


def loss_level(att_l, del_l, gt):
    return zsg_loss_levels(att_l, del_l, comps, gt, **kw)["total"]


def loss_pallas_flat(att, bbx, gt):
    return zsg_loss_fused(att, bbx, anchors_packed, gt, num_anchors=A, **kw)["total"]


def loss_jnp_flat(att, bbx, gt):
    labels, reg_t = anchor_ops.match_and_encode(
        anchors_c, gt, cfg.matching_threshold, cfg.neg_threshold, use_multi=True
    )
    return losses.zsg_loss(att, bbx, labels, reg_t, lamb_reg=cfg.lamb_reg,
                           alpha=cfg.focal_alpha, gamma=cfg.focal_gamma)["total"]


att_flat, bbx_flat = jax.jit(flatten)(att_levels, delta_levels)
jax.block_until_ready((att_flat, bbx_flat))

# ---- equality on the chip (compiled, not interpreted) ----
v_level = float(jax.jit(loss_level)(att_levels, delta_levels, gt))
v_pallas = float(jax.jit(loss_pallas_flat)(att_flat, bbx_flat, gt))
v_jnp = float(jax.jit(loss_jnp_flat)(att_flat, bbx_flat, gt))
print(f"loss: level={v_level:.6f} pallas={v_pallas:.6f} jnp={v_jnp:.6f}")
np.testing.assert_allclose(v_level, v_pallas, rtol=1e-4)
np.testing.assert_allclose(v_level, v_jnp, rtol=1e-4)
print("equality: OK (compiled on TPU)")

# ---- grad equality (custom VJP vs autodiff paths) ----
g_level = jax.jit(jax.grad(lambda a, d: loss_level(a, d, gt)))(att_levels, delta_levels)
g_pallas = jax.jit(jax.grad(lambda a, b: loss_pallas_flat(a, b, gt)))(att_flat, bbx_flat)
g_jnp = jax.jit(jax.grad(lambda a, b: loss_jnp_flat(a, b, gt)))(att_flat, bbx_flat)
g_level_att_flat = np.concatenate(
    [np.asarray(x).reshape(B, -1) for x in g_level], axis=1
)
np.testing.assert_allclose(
    np.asarray(g_pallas), np.asarray(g_jnp), atol=1e-5
)
np.testing.assert_allclose(
    g_level_att_flat, np.asarray(g_pallas), atol=1e-5
)
print("grad equality: OK")


K = 50  # chained iterations per measurement


def timeit(fn, args, reps=4):
    """ms per fn() — K scan-chained evals per device round-trip.

    A per-iteration scalar fetch costs a full ~30 ms tunnel RTT, burying
    kernel times; instead ONE jit runs K data-dependent iterations
    (carry perturbs the input, defeating CSE/hoisting) and the host
    fetches one scalar.
    """

    def run_k(*a):
        def body(carry, _):
            pert = jax.tree.map(lambda x: x + carry * 1e-30, a)
            return fn(*pert), None
        v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return v

    f = jax.jit(run_k)
    float(f(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best, None


def vg(fn):
    """scalar value+grad-norm — times the full fwd+bwd of the loss."""
    def run(*args):
        v, g = jax.value_and_grad(fn, argnums=(0, 1))(*args)
        return v + sum(jnp.sum(x * 0.0) + jnp.max(jnp.abs(x))
                       for x in jax.tree.leaves(g))
    return run


rows = []
for name, fn, args in [
    ("level (XLA, native NHWC)", vg(lambda a, d: loss_level(a, d, gt)),
     (att_levels, delta_levels)),
    ("pallas-flat (pre-laid-out)", vg(lambda a, b: loss_pallas_flat(a, b, gt)),
     (att_flat, bbx_flat)),
    ("jnp-flat (pre-laid-out)", vg(lambda a, b: loss_jnp_flat(a, b, gt)),
     (att_flat, bbx_flat)),
    ("flatten+pallas (real cost)",
     vg(lambda a, d: loss_pallas_flat(*flatten(a, d), gt)),
     (att_levels, delta_levels)),
    ("flatten+jnp (real cost)",
     vg(lambda a, d: loss_jnp_flat(*flatten(a, d), gt)),
     (att_levels, delta_levels)),
]:
    ms, _ = timeit(fn, args)
    rows.append((name, ms))
    print(f"{name:30s} {ms:8.3f} ms/iter (value+grad, B={B})")

print("\nBASELINE.md rows:")
for name, ms in rows:
    print(f"| loss+grad: {name} | {ms:.3f} ms | B={B}, A={A}, v5e |")

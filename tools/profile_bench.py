"""Decompose inference cost on the TPU: forward vs decode vs eval extras."""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from zsgnet_tpu.config import get_default_cfg
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
from zsgnet_tpu.ops import boxes as box_ops
from zsgnet_tpu.train.evaluator import eval_batch
from zsgnet_tpu.utils.profiling import time_fn

B = 64
cfg = get_default_cfg().replace(bs=B, do_dist=False)
model = get_default_net(cfg, vocab_size=10000)
rng = np.random.default_rng(0)
h, w = cfg.resize_img
batch = {
    "img": jnp.asarray(rng.normal(size=(B, h, w, 3)).astype(np.float32)),
    "qvec": jnp.asarray(rng.integers(1, 10000, size=(B, cfg.max_qlen)).astype(np.int32)),
    "qlens": jnp.asarray(rng.integers(3, 12, size=(B,)).astype(np.int32)),
}
gt = jnp.asarray(np.tile(np.array([-0.5, -0.5, 0.5, 0.5], np.float32), (B, 1)))
variables = jax.jit(lambda r, b: model.init(r, b, train=False))(jax.random.PRNGKey(0), batch)
anchors = jnp.asarray(anchor_pyramid_for(cfg))


@jax.jit
def fwd_only(variables, batch):
    return model.apply(variables, batch, train=False)["att_out"]


@jax.jit
def fwd_decode(variables, batch):
    out = model.apply(variables, batch, train=False)
    best = jnp.argmax(out["att_out"], axis=-1)
    sel_anchor = anchors[best]
    sel_reg = jnp.take_along_axis(out["bbx_out"], best[:, None, None], axis=1)[:, 0]
    return box_ops.clip_boxes(box_ops.reg_params_to_bbox(sel_anchor, sel_reg))


@jax.jit
def fwd_full_eval(variables, batch, gt):
    out = model.apply(variables, batch, train=False)
    return eval_batch(out["att_out"], out["bbx_out"], anchors, gt, 0.5)["pred_box"]


for name, fn, args in (
    ("fwd_only", fwd_only, (variables, batch)),
    ("fwd_decode", fwd_decode, (variables, batch)),
    ("fwd_full_eval", fwd_full_eval, (variables, batch, gt)),
):
    t, _ = time_fn(fn, *args, warmup=3, iters=20)
    print(f"{name:14s} {t*1000:8.2f} ms/iter  {B/t:9.1f} qps")

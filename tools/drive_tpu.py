"""Drive zsgnet_tpu end-to-end on the real TPU through the public API."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp

print("devices:", jax.devices())

from zsgnet_tpu import get_default_cfg
from zsgnet_tpu.models import get_default_net
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for
from zsgnet_tpu.ops import anchors as anchor_ops, losses
from zsgnet_tpu.train.evaluator import eval_batch, Evaluator

cfg = get_default_cfg().replace(bs=4)   # full 300x300 retina config, bf16
print("cfg:", cfg.ds_to_use, cfg.mdl_to_use, cfg.resize_img, cfg.compute_dtype)

rng = np.random.default_rng(0)
B = cfg.bs
h, w = cfg.resize_img
batch = {
    "img": jnp.asarray(rng.normal(size=(B, h, w, 3)).astype(np.float32)),
    "qvec": jnp.asarray(rng.integers(1, 1000, size=(B, cfg.max_qlen)).astype(np.int32)),
    "qlens": jnp.asarray(np.array([5, 9, 3, cfg.max_qlen], dtype=np.int32)),
}
gt = np.array([[-.5,-.5,.2,.3],[-.1,-.2,.4,.5],[0.,0.,.6,.6],[-.8,-.8,-.2,-.2]], dtype=np.float32)
gt_j = jnp.asarray(gt)

model = get_default_net(cfg, vocab_size=1000)
t0 = time.time()
variables = model.init(jax.random.PRNGKey(0), batch)
print(f"init: {time.time()-t0:.1f}s  params:",
      sum(x.size for x in jax.tree.leaves(variables["params"])) / 1e6, "M")

anchors = jnp.asarray(anchor_pyramid_for(cfg))
print("anchors:", anchors.shape)

@jax.jit
def fwd_loss_eval(variables, batch, gt):
    out = model.apply(variables, batch)
    labels, reg_t = anchor_ops.match_and_encode(anchors, gt, cfg.matching_threshold, cfg.neg_threshold)
    ls = losses.zsg_loss(out["att_out"], out["bbx_out"], labels, reg_t,
                         lamb_reg=cfg.lamb_reg, use_focal=cfg.use_focal)
    ev = eval_batch(out["att_out"], out["bbx_out"], anchors, gt, cfg.acc_iou_threshold)
    return out, ls, ev

t0 = time.time()
out, ls, ev = jax.tree.map(lambda x: x, fwd_loss_eval(variables, batch, gt_j))
jax.block_until_ready(ls["total"])
print(f"first jit fwd+loss+eval: {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(3):
    out, ls, ev = fwd_loss_eval(variables, batch, gt_j)
jax.block_until_ready(ls["total"])
print(f"steady 3 iters: {(time.time()-t0)/3*1000:.1f} ms/iter")

print("att_out:", out["att_out"].shape, out["att_out"].dtype,
      "bbx_out:", out["bbx_out"].shape)
print("loss:", {k: float(v) for k, v in ls.items()})
print("eval iou:", np.asarray(ev["iou"]).round(3), "pred_box[0]:", np.asarray(ev["pred_box"][0]).round(3))

evaluator = Evaluator(cfg.acc_iou_threshold)
evaluator.update({k: np.asarray(v) for k, v in ev.items()}, cases=np.array([0,1,2,0]))
print("summary:", evaluator.summarize())

# probe: all-pad query (qlens=1 minimum) + degenerate tiny gt box
batch2 = dict(batch, qlens=jnp.asarray(np.array([1,1,1,1], dtype=np.int32)))
gt2 = jnp.asarray(np.array([[0.,0.,1e-4,1e-4]]*4, dtype=np.float32))
out2, ls2, ev2 = fwd_loss_eval(variables, batch2, gt2)
print("probe degenerate: loss finite:", all(np.isfinite(float(v)) for v in ls2.values()),
      {k: round(float(v),4) for k,v in ls2.items()})

"""Gradient fidelity of the BN variance modes vs the exact form.

The deciding numerics for BASELINE.md's bn_variance accept/reject rows:
builds the tiny ZSGNet, lets running stats track the batch moments for a
few steps (the c≈μ regime the shifted form is designed for), then
compares full-model parameter gradients against bn_variance="exact"
under fp32 compute (isolating the moment-math effect from bf16 noise).

Measured on this harness (round 3):
  * shifted   — rel-L2 0.022 vs exact (the documented ≤2% trajectory
    agreement; accepted, BASELINE.md round 2);
  * shifted16 — rel-L2 1.28 vs exact: bf16 rounding in the moment path
    breaks the near-cancellation in the BN backward
    (dx ∝ dy − mean(dy) − y·mean(dy·y)); gradients are garbage even
    though forward outputs stay within 2 bf16 ulps. REJECTED — and the
    chip wall-clock was 126.4 ms vs 125.9 baseline (no gain to trade
    anyway: XLA already reads the bf16 activation and accumulates fp32;
    the fp32 "cost" this experiment targeted was never a real read).

Usage: python tools/check_bn_grads.py   (CPU, ~1 min)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zsgnet_tpu.config import get_default_cfg  # noqa: E402
from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net  # noqa: E402
from zsgnet_tpu.parallel.train_step import create_train_state, make_compute_loss  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(0)
    B, H = 4, 64
    base = get_default_cfg().replace(
        bs=B, resize_img=(H, H), max_qlen=6, lstm_dim=16, emb_dim=16,
        fpn_ch=32, head_ch=32, do_dist=False, compute_dtype="float32",
        use_pallas=False,
    )
    batch = {
        "img": jnp.asarray(rng.integers(0, 255, (B, H, H, 3)).astype(np.uint8)),
        "qvec": jnp.asarray(rng.integers(1, 100, (B, 6)).astype(np.int32)),
        "qlens": jnp.asarray(rng.integers(3, 6, (B,)).astype(np.int32)),
        "annot": jnp.asarray(
            np.stack(
                [rng.uniform(-0.9, -0.1, (B, 2)), rng.uniform(0.1, 0.9, (B, 2))], 1
            ).reshape(B, 4).astype(np.float32)
        ),
    }

    grads = {}
    for mode in ("exact", "shifted", "shifted16"):
        cfg = base.replace(bn_variance=mode)
        model = get_default_net(cfg, vocab_size=100)
        state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
        stats = state.batch_stats
        for _ in range(3):  # track running stats toward batch moments (c≈μ)
            _, upd = model.apply(
                {"params": state.params, "batch_stats": stats},
                batch, train=True, mutable=["batch_stats"],
            )
            stats = upd["batch_stats"]
        loss_fn = make_compute_loss(cfg, anchor_pyramid_for(cfg), axis=None)

        def tot(p, stats=stats, model=model, loss_fn=loss_fn):
            out, _ = model.apply(
                {"params": p, "batch_stats": stats}, batch,
                train=True, mutable=["batch_stats"],
            )
            return loss_fn(out, batch["annot"])["total"]

        grads[mode] = jax.grad(tot)(state.params)

    flat_e = jax.tree.leaves(grads["exact"])
    den = sum(float(jnp.sum(a**2)) for a in flat_e)
    for m in ("shifted", "shifted16"):
        flat_m = jax.tree.leaves(grads[m])
        num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(flat_e, flat_m))
        rel = np.sqrt(num / den)
        print(f"{m}: global grad rel-L2 vs exact = {rel:.4g}")
    assert np.isfinite(rel)


if __name__ == "__main__":
    main()

"""Chip benchmark: grouped multi-query training vs the flat train step.

Measures pairs/sec of the jitted retina 300² train step at equal
(image, phrase) pairs per step:

  * flat    — bs=PAIRS pairs, one backbone pass per PAIR (the only mode
              the reference's DDP training has);
  * grouped — bs=PAIRS/Q images × Q phrases (cfg.queries_per_img):
              one backbone pass per IMAGE, fusion head broadcast per
              pair — grads equal the flat step (tests/test_multiquery.py).

Flickr30k Entities averages ~5 phrases/image, so Q=5 is the headline row
(VERDICT r3 #4: target >= 2.5x train pairs/sec at Q=5). Constant device
batches (no host transfer in the loop) — judge step time only.

Usage: timeout 1100 python tools/bench_grouped_train.py [PAIRS] [Q]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 5
WARMUP, ITERS = 3, 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from zsgnet_tpu.config import get_default_cfg
    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for, get_default_net
    from zsgnet_tpu.parallel.train_step import create_train_state, make_train_step
    from zsgnet_tpu.utils.backend import devices_or_die

    devices_or_die(timeout_s=600, retries=2, tag="bench_grouped")
    assert PAIRS % Q == 0, f"PAIRS={PAIRS} must divide Q={Q}"
    b_img = PAIRS // Q
    rng = np.random.default_rng(0)
    vocab_size = 10000

    def make_batch(grouped: bool):
        cfg = get_default_cfg().replace(
            do_dist=False,
            bs=b_img if grouped else PAIRS,
            queries_per_img=Q if grouped else 1,
        )
        h, w = cfg.resize_img
        n_img = b_img if grouped else PAIRS
        qshape = (b_img, Q) if grouped else (PAIRS,)
        gt = np.stack(
            [
                rng.uniform(-1, -0.1, qshape), rng.uniform(-1, -0.1, qshape),
                rng.uniform(0.1, 1, qshape), rng.uniform(0.1, 1, qshape),
            ],
            axis=-1,
        ).astype(np.float32)
        batch = {
            "img": jnp.asarray(
                rng.integers(0, 255, size=(n_img, h, w, 3)).astype(np.uint8)
            ),
            "qvec": jnp.asarray(
                rng.integers(1, vocab_size, size=qshape + (cfg.max_qlen,)).astype(np.int32)
            ),
            "qlens": jnp.asarray(rng.integers(3, 12, size=qshape).astype(np.int32)),
            "annot": jnp.asarray(gt),
        }
        return cfg, batch

    def measure(tag: str, grouped: bool, masked: bool = False) -> float:
        cfg, batch = make_batch(grouped)
        if masked:
            # The shipped real-data grouped path (r5): the loader always
            # emits pair_valid and the loss masks wrap-repeats — the
            # weight multiply rides in the compiled program. One wrapped
            # pair per batch approximates the Flickr tail.
            pv = np.ones((b_img, Q), bool)
            pv[0, -1] = False
            batch = dict(batch, pair_valid=jnp.asarray(pv))
        model = get_default_net(cfg, vocab_size=vocab_size)
        state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
        step = make_train_step(cfg, anchor_pyramid_for(cfg), mesh=None)
        t0 = time.time()
        for _ in range(WARMUP):
            state, ls = step(state, batch)
        float(ls["total"])
        print(f"{tag}: compile+warmup {time.time() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, ls = step(state, batch)
        total = float(ls["total"])  # value fetch closes the queued pipeline
        dt = time.perf_counter() - t0
        qps = PAIRS * ITERS / dt
        print(
            f"{tag}: {dt / ITERS * 1e3:.1f} ms/step, {qps:.1f} pairs/s "
            f"(loss {total:.3f})",
            flush=True,
        )
        return qps

    flat = measure(f"flat bs={PAIRS}", grouped=False)
    grp = measure(f"grouped {b_img}x{Q}", grouped=True)
    grp_m = measure(f"grouped+mask {b_img}x{Q}", grouped=True, masked=True)
    print(f"grouped speedup at Q={Q}: {grp / flat:.2f}x "
          f"(with pair_valid mask: {grp_m / flat:.2f}x)")


if __name__ == "__main__":
    main()

"""The full migration loop, zero manual steps (VERDICT r2 #4).

A reference user's path: a trainer-format ``.pth`` (DDP ``module.``
wrapper included) → ``python -m zsgnet_tpu.convert`` (layout auto-detect,
Orbax output, cfg.json + vocab.json sidecars) → ``python -m
zsgnet_tpu.main --only_val --resume --resume_path=<out>`` → metrics. The
framework's eval of the converted model must equal the torch model's own
eval on the same CSV split (Acc within 0.5 pt — in practice exact; the
decode is shared so any gap is model-conversion error).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import torch  # noqa: E402

from zsgnet_tpu.config import Config  # noqa: E402
from zsgnet_tpu.data import synthetic  # noqa: E402
from zsgnet_tpu.data.dataset import get_data  # noqa: E402

pytestmark = pytest.mark.slow

EMB, HID, FPN_CH, HEAD_CH, A = 16, 16, 32, 32, 9


def test_pth_to_cli_to_learner_metrics(tmp_path):
    import jax.numpy as jnp

    from test_convert_full import TorchZSGNet, _randomize_bn

    from zsgnet_tpu.convert.__main__ import main as convert_main
    from zsgnet_tpu.main import main_dist
    from zsgnet_tpu.models.zsgnet import anchor_pyramid_for
    from zsgnet_tpu.train.evaluator import Evaluator, eval_batch

    root = tmp_path / "data"
    synthetic.generate(root, n_train=8, n_val=12, n_test=4, img_size=64)
    base = Config(
        ds_to_use="synthetic", data_dir=str(root), bs=4, nw=1,
        resize_img=(64, 64), max_qlen=8, lstm_dim=HID, emb_dim=EMB,
        fpn_ch=FPN_CH, head_ch=HEAD_CH, compute_dtype="float32",
        use_pallas=False, do_dist=False, tmp_path=str(tmp_path / "tmp"),
    )
    data = get_data(base)  # builds vocab.json beside the CSVs
    vocab_path = root / "synthetic" / "csv_dir" / "vocab.json"

    # --- the "reference" artifact: a trainer-format .pth ---
    torch.manual_seed(7)
    tm = TorchZSGNet(len(data.vocab), EMB, HID, FPN_CH, HEAD_CH, A).eval()
    _randomize_bn(tm)
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    pth = tmp_path / "ref.pth"
    torch.save({"model_state_dict": sd, "epoch": 3, "best_acc": 0.1}, pth)

    # --- migration CLI: .pth → self-contained Orbax dir ---
    out_dir = tmp_path / "converted"
    report = convert_main([
        str(pth), str(out_dir),
        "--resize_img=[64,64]", "--max_qlen=8", "--lstm_dim=16",
        "--fpn_ch=32", "--head_ch=32", "--use_pallas=false",
        f"--vocab={vocab_path}",
    ])
    assert report["leaves_converted"] == report["leaves_total"]
    assert (out_dir / "cfg.json").exists() and (out_dir / "vocab.json").exists()

    # --- framework eval through the real CLI path, NO architecture flags
    # (cfg.json sidecar is the base) ---
    got = main_dist(
        "t_migr", only_val=True, resume=True, resume_path=str(out_dir),
        ds_to_use="synthetic", data_dir=str(root), bs=4, nw=1,
        tmp_path=str(tmp_path / "tmp"), do_dist=False,
    )

    # --- the torch model's own eval on the same CSV split, through the
    # same decode/metric math (isolates model-conversion error) ---
    anchors = jnp.asarray(anchor_pyramid_for(base))
    evaluator = Evaluator(base.acc_iou_threshold)
    host_cfg = base.replace(normalize_on_device=False)  # fp32 imgs on host
    host_data = get_data(host_cfg)
    for batch in host_data.valid_dl:
        with torch.no_grad():
            att, bbx = tm(
                torch.tensor(batch["img"].transpose(0, 3, 1, 2)),
                torch.tensor(batch["qvec"].astype(np.int64)),
                torch.tensor(batch["qlens"]),
            )
        ev = eval_batch(
            jnp.asarray(att.numpy()), jnp.asarray(bbx.numpy()), anchors,
            jnp.asarray(batch["annot"]), base.acc_iou_threshold,
        )
        evaluator.update(
            {k: np.asarray(v) for k, v in ev.items()},
            cases=batch.get("case"), ids=batch.get("idxs"),
            valid=batch.get("valid"),
        )
    want = evaluator.summarize()

    assert got["num_samples"] == want["num_samples"] == 12
    assert abs(got["Acc"] - want["Acc"]) <= 0.005  # ≤0.5 pt (expect exact)
    np.testing.assert_allclose(got["MaxPos"], want["MaxPos"], atol=1e-6)
    np.testing.assert_allclose(got["MeanIoU"], want["MeanIoU"], atol=2e-3)

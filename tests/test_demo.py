"""The stranger-operability surface: ``--list_flags`` + the packaged demo."""

import pytest

from zsgnet_tpu.main import list_flags, parse_args


def test_list_flags_covers_every_config_field():
    import dataclasses

    from zsgnet_tpu.config import Config

    text = list_flags()
    for f in dataclasses.fields(Config):
        assert f"--{f.name}=" in text, f"flag listing misses {f.name}"
    # Reference aliases are surfaced next to their canonical key.
    assert "[batch_size]" in text and "--bs=" in text


def test_list_flags_exits_before_uid_requirement():
    with pytest.raises(SystemExit) as e:
        parse_args(["--list_flags"])
    assert "--grad_accum=" in str(e.value)


@pytest.mark.slow
def test_demo_end_to_end(tmp_path):
    """python -m zsgnet_tpu.demo: train → eval → checkpoint-serve → AOT
    artifact, on a fresh machine with zero inputs. The demo asserts
    live-vs-artifact drift internally."""
    from zsgnet_tpu.demo import demo

    metrics = demo(workdir=tmp_path, epochs=1, n_train=8, bs=4)
    assert {"Acc", "MaxPos", "MeanIoU"} <= set(metrics)
    assert (tmp_path / "artifact" / "export.json").exists()

    # ckpt_info answers for both artifact kinds the demo produced.
    from zsgnet_tpu.ckpt_info import describe

    ck = describe(tmp_path / "tmp" / "models" / "demo")
    assert ck["self_contained"] and ck["epoch"] == 1
    assert ck["cfg_non_default"]["fpn_ch"] == 32
    art = describe(tmp_path / "artifact")
    assert art["kind"].startswith("serving artifact")
    assert art["modules"]


def test_grouped_preset_loads():
    """The shipped Flickr30k grouped-training preset (VERDICT r4 #9 —
    the 3.08x lever as a documented recipe, not an expert flag) parses
    via --cfg_file semantics, sets the grouped configuration, and
    validates at construction. Underscore keys are documentation."""
    from pathlib import Path

    from zsgnet_tpu.config import get_default_cfg

    preset = Path(__file__).parent.parent / "configs" / "flickr30k_grouped.json"
    cfg = get_default_cfg(preset)
    assert cfg.ds_to_use == "flickr30k"
    assert cfg.queries_per_img == 5 and cfg.bs == 24
    assert cfg.grouped_reseed  # per-epoch re-grouping on by default
    assert cfg.resize_img == (300, 300) and cfg.compute_dtype == "bfloat16"

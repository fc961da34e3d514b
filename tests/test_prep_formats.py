"""Prep parsers vs format-faithful release fixtures (VERDICT r2 #7).

The real ReferIt/Flickr30k/VG releases are absent from this environment,
but their FORMATS are published. These tests run the full ``convert()``
entry points over miniature fixtures that mirror the release layouts
byte-for-byte in structure:

  * ``tests/fixtures/flickr30k_entities/`` — Sentences ``[/EN#id/type …]``
    markup incl. ``EN#0/notvisual``, multi-type tags
    (``/clothing/bodyparts``), scene chains; Annotations XML incl.
    multi-``<name>`` objects (one box, several chains), ``<nobndbox>1``
    and ``<scene>1`` objects; train/val/test id lists.
  * refer-toolkit pickles (built in-test: binary format) — the exact
    ``refs(*.p)`` dict schema (ref_id/ann_id/image_id/split/sentences
    with tokens+raw+sent+sent_id) with unc-style testA/testB splits, plus
    a COCO-format ``instances.json``.
  * ``tests/fixtures/vg/`` — ``region_descriptions.json`` (width/height
    keys) and ``objects.json`` (w/h keys, names + WordNet synsets), the
    published key asymmetry included.
"""

import json
import pickle
from pathlib import Path

import pandas as pd

from zsgnet_tpu.data.prep.flickr30k import convert as flickr_convert
from zsgnet_tpu.data.prep.flickr30k import parse_sentence_typed
from zsgnet_tpu.data.prep.referit import convert as referit_convert
from zsgnet_tpu.data.prep.visual_genome import build_category_map
from zsgnet_tpu.data.prep.visual_genome import convert as vg_convert
from zsgnet_tpu.data.prep.zero_shot_splits import split_cases23

FIX = Path(__file__).parent / "fixtures"


# ---------------------------------------------------------------- flickr30k
def test_flickr_multitype_markup():
    line = "[/EN#1/people Two men] in [/EN#6/clothing/bodyparts green shirts] ."
    got = parse_sentence_typed(line)
    assert got == [
        (1, ("people",), "Two men"),
        (6, ("clothing", "bodyparts"), "green shirts"),
    ]


def test_flickr_release_layout(tmp_path, capsys):
    root = FIX / "flickr30k_entities"
    flickr_convert(root / "Annotations", root / "Sentences", root / "splits", tmp_path)
    train = pd.read_csv(tmp_path / "csv_dir" / "train.csv")
    test = pd.read_csv(tmp_path / "csv_dir" / "test.csv")

    # notvisual (EN#0), nobndbox (EN#3), boxless scene (EN#4) all dropped;
    # kept: 4×EN#1, EN#2, EN#5, EN#6 = 7 rows.
    assert len(train) == 7
    assert not train["query"].str.contains("friendly game|their hands|yard").any()
    # plural-entity chain EN#1 (two <object> boxes): union box.
    guys = train[train["query"] == "two young guys"]
    assert len(guys) == 1
    assert tuple(guys.iloc[0][["x1", "y1", "x2", "y2"]]) == (24.0, 21.0, 361.0, 333.0)
    # multi-<name> object: one box serves chains 2 AND 6.
    assert (train["query"] == "shaggy hair").sum() == 1
    assert (train["query"] == "green shirts").sum() == 1

    # scene chain WITH a real box (EN#12) is kept; nobndbox EN#13 dropped.
    assert sorted(test["query"]) == ["a brown dog", "a grassy field", "the dog"]
    out = capsys.readouterr().out
    assert "1 notvisual, 2 scene (boxless), 3 other boxless chains" in out


# ----------------------------------------------------------------- referit
def _toolkit_ref(ref_id, ann_id, image_id, split, sents):
    """Exact refer-toolkit dict schema (refs(unc).p entries)."""
    return {
        "ref_id": ref_id,
        "ann_id": ann_id,
        "image_id": image_id,
        "category_id": 1,
        "split": split,
        "file_name": f"{image_id}.jpg",
        "sent_ids": list(range(len(sents))),
        "sentences": [
            {
                "sent_id": i,
                "raw": s,
                "sent": s.lower(),
                "tokens": s.lower().split(),
            }
            for i, s in enumerate(sents)
        ],
    }


def test_referit_testA_testB_preserved(tmp_path):
    refs = [
        _toolkit_ref(0, 10, 100, "train", ["A man on the left", "leftmost guy"]),
        _toolkit_ref(1, 11, 100, "val", ["the red car"]),
        _toolkit_ref(2, 12, 101, "testA", ["Woman in blue"]),
        _toolkit_ref(3, 13, 101, "testB", ["the middle chair"]),
    ]
    instances = {
        "images": [
            {"id": 100, "file_name": "19579_3.jpg", "width": 480, "height": 360},
            {"id": 101, "file_name": "22footb_2.jpg", "width": 640, "height": 480},
        ],
        "annotations": [
            {"id": 10, "image_id": 100, "bbox": [10, 20, 30, 40], "category_id": 1, "area": 1200},
            {"id": 11, "image_id": 100, "bbox": [50, 60, 70, 80], "category_id": 2, "area": 5600},
            {"id": 12, "image_id": 101, "bbox": [5, 6, 7, 8], "category_id": 1, "area": 56},
            {"id": 13, "image_id": 101, "bbox": [1, 2, 3, 4], "category_id": 3, "area": 12},
        ],
        "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "car"},
                       {"id": 3, "name": "chair"}],
    }
    refer_dir = tmp_path / "refclef"
    refer_dir.mkdir()
    with open(refer_dir / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    (refer_dir / "instances.json").write_text(json.dumps(instances))

    referit_convert(refer_dir, tmp_path, refs_file="refs(unc).p")
    csv = tmp_path / "csv_dir"
    train = pd.read_csv(csv / "train.csv")
    a = pd.read_csv(csv / "testA.csv")
    b = pd.read_csv(csv / "testB.csv")
    union = pd.read_csv(csv / "test.csv")

    assert len(train) == 2  # one row per expression
    # xywh → xyxy
    assert tuple(train.iloc[0][["x1", "y1", "x2", "y2"]]) == (10, 20, 40, 60)
    assert list(a["query"]) == ["woman in blue"]
    assert list(b["query"]) == ["the middle chair"]
    # union test.csv = testA + testB, per-split CSVs preserved distinct
    assert sorted(union["query"]) == ["the middle chair", "woman in blue"]


# ---------------------------------------------------------------------- vg
def test_vg_objects_json_category_map():
    cats, img_objects = build_category_map(FIX / "vg" / "objects.json")
    # synset head: clock.n.01 → clock; every word of "gray wolf" → wolf
    assert cats["clock"] == "clock"
    assert cats["wolf"] == "wolf" and cats["gray"] == "wolf"
    assert img_objects[2] == ["dog", "road", "wolf"]


def test_vg_convert_to_case23(tmp_path):
    vg_convert(
        FIX / "vg" / "region_descriptions.json", tmp_path,
        val_frac=0.34, test_frac=0.34,  # 3 images → 1 val, 1 test, 1 train
        objects_json=FIX / "vg" / "objects.json",
    )
    csv = tmp_path / "csv_dir"
    cats = json.loads((tmp_path / "categories.json").read_text())
    rows = pd.concat(
        [pd.read_csv(csv / s) for s in ("train.csv", "val.csv", "test.csv")],
        ignore_index=True,
    )
    # min_size filter dropped the 10×7 region; 5 regions remain
    assert len(rows) == 5
    assert not rows["query"].str.contains("tiny region").any()
    # x/y/width/height → xyxy
    clock = rows[rows["query"] == "the clock is green in colour"].iloc[0]
    assert tuple(clock[["x1", "y1", "x2", "y2"]]) == (421.0, 57.0, 503.0, 196.0)
    # objects column drives cases 2/3: wolf held out; image 2 contains a
    # similar distractor (dog) → case 3, image 3 (rock only) → case 2.
    wolves = rows[rows["query"].str.contains("wolf")]
    out = split_cases23(wolves, cats, {"wolf"}, {"wolf": ["dog"]})
    by_img = {r["img_id"]: r["case"] for _, r in out.iterrows()}
    assert by_img == {"2.jpg": 3, "3.jpg": 2}


# ------------------------------------------------------- loader sub-splits
def test_loader_test_split_knob(tmp_path):
    """cfg.test_split=testA evals the preserved sub-split CSV."""
    from zsgnet_tpu.config import Config
    from zsgnet_tpu.data import synthetic
    from zsgnet_tpu.data.dataset import get_data

    synthetic.generate(tmp_path, n_train=4, n_val=2, n_test=4, img_size=32)
    csv_dir = tmp_path / "synthetic" / "csv_dir"
    full = pd.read_csv(csv_dir / "test.csv")
    full.iloc[:2].to_csv(csv_dir / "testA.csv", index=False)

    cfg = Config(
        ds_to_use="synthetic", data_dir=str(tmp_path), bs=2, nw=0,
        resize_img=(32, 32), max_qlen=4, test_split="testA",
        compute_dtype="float32", do_dist=False, tmp_path=str(tmp_path / "t"),
    )
    data = get_data(cfg)
    assert len(data.test_dl.ds) == 2  # testA.csv, not test.csv (4 rows)

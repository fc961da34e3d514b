"""Data-prep tests: sentence/XML parsing, zero-shot split logic."""

import json

import pandas as pd

from zsgnet_tpu.data.prep.flickr30k import parse_sentence, union_box
from zsgnet_tpu.data.prep.zero_shot_splits import split_case0, split_case1, split_cases23


def test_parse_flickr_sentence():
    line = "[/EN#283585/people A woman] looks at [/EN#283589/other the red sign]"
    got = parse_sentence(line)
    assert got == [(283585, "A woman"), (283589, "the red sign")]


def test_union_box():
    assert union_box([(0, 0, 10, 10), (5, 5, 20, 15)]) == (0, 0, 20, 15)


def _df(rows):
    return pd.DataFrame(rows)


def test_split_case0_unseen_words():
    train = _df([{"img_id": "a", "x1": 0, "y1": 0, "x2": 1, "y2": 1, "query": "the red box"}])
    test = _df(
        [
            {"img_id": "b", "x1": 0, "y1": 0, "x2": 1, "y2": 1, "query": "the red box"},
            {"img_id": "c", "x1": 0, "y1": 0, "x2": 1, "y2": 1, "query": "the azure box"},
        ]
    )
    out = split_case0(train, test)
    assert len(out) == 1 and out.iloc[0]["query"] == "the azure box"
    assert out.iloc[0]["case"] == 0


def test_split_case1_unseen_categories():
    cats = {"dog": "animal", "cat": "animal", "car": "vehicle"}
    train = _df(
        [
            {"query": "a brown dog"},
            {"query": "a red car"},
        ]
    )
    test = _df(
        [
            {"query": "a small cat"},
            {"query": "a blue car"},
        ]
    )
    tr, te = split_case1(train, test, cats, holdout={"animal"})
    assert list(tr["query"]) == ["a red car"]  # animal rows dropped from train
    assert list(te["query"]) == ["a small cat"]
    assert te.iloc[0]["case"] == 1


def test_split_cases23_distractors():
    cats = {"wolf": "canine"}
    sim = {"canine": ["dog", "fox"]}
    test = _df(
        [
            {"query": "the gray wolf", "objects": json.dumps(["tree", "rock"])},
            {"query": "the gray wolf", "objects": json.dumps(["dog", "rock"])},
        ]
    )
    out = split_cases23(test, cats, {"canine"}, sim)
    assert list(out["case"]) == [2, 3]

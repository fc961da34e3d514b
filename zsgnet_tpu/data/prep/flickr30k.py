"""Flickr30k Entities → unified CSV.

Parses the standard Flickr30k Entities release layout:
  * ``Annotations/<img_id>.xml`` — PASCAL-VOC-style boxes tagged with
    coreference-chain ids;
  * ``Sentences/<img_id>.txt`` — sentences with phrase markup
    ``[/EN#<chain_id>/<type> the phrase words]``.

Each (phrase, box) pair becomes one CSV row; phrases whose chain has
multiple boxes use the union box (the dataset's convention for plural
entities), matching the reference pipeline's grounding granularity.

Splits follow the standard train/val/test image lists (pass ``--split-dir``
containing train.txt/val.txt/test.txt of image ids).
"""

from __future__ import annotations

import argparse
import re
import xml.etree.ElementTree as ET
from pathlib import Path

import pandas as pd

_PHRASE_RE = re.compile(r"\[/EN#(\d+)(?:/[^\s\]]+)?\s([^\]]+)\]")


def parse_sentence(line: str) -> list[tuple[int, str]]:
    """→ [(chain_id, phrase), ...] from one marked-up sentence."""
    return [(int(m.group(1)), m.group(2).strip()) for m in _PHRASE_RE.finditer(line)]


def parse_annotation_xml(path: Path) -> dict[int, list[tuple[float, float, float, float]]]:
    """→ chain_id → [(x1, y1, x2, y2), ...]."""
    root = ET.parse(path).getroot()
    boxes: dict[int, list[tuple[float, float, float, float]]] = {}
    for obj in root.findall("object"):
        names = [n.text for n in obj.findall("name")]
        bb = obj.find("bndbox")
        if bb is None:
            continue
        coords = tuple(
            float(bb.find(k).text) for k in ("xmin", "ymin", "xmax", "ymax")
        )
        for name in names:
            try:
                chain = int(name)
            except (TypeError, ValueError):
                continue
            boxes.setdefault(chain, []).append(coords)
    return boxes


def union_box(boxes: list[tuple[float, float, float, float]]) -> tuple[float, float, float, float]:
    xs1, ys1, xs2, ys2 = zip(*boxes)
    return min(xs1), min(ys1), max(xs2), max(ys2)


def convert(
    annotations: Path, sentences: Path, split_dir: Path, out: Path, img_ext: str = ".jpg"
) -> None:
    out_csv = out / "csv_dir"
    out_csv.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "test"):
        ids = (split_dir / f"{split}.txt").read_text().split()
        rows = []
        for img_id in ids:
            ann_path = annotations / f"{img_id}.xml"
            sent_path = sentences / f"{img_id}.txt"
            if not ann_path.exists() or not sent_path.exists():
                continue
            chain_boxes = parse_annotation_xml(ann_path)
            for line in sent_path.read_text().splitlines():
                for chain, phrase in parse_sentence(line):
                    if chain not in chain_boxes or not phrase:
                        continue
                    x1, y1, x2, y2 = union_box(chain_boxes[chain])
                    rows.append(
                        {
                            "img_id": f"{img_id}{img_ext}",
                            "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                            "query": phrase.lower(),
                        }
                    )
        pd.DataFrame(rows).to_csv(out_csv / f"{split}.csv", index=False)
        print(f"{split}: {len(rows)} phrase-box pairs")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--annotations", type=Path, required=True)
    ap.add_argument("--sentences", type=Path, required=True)
    ap.add_argument("--split-dir", type=Path, required=True)
    ap.add_argument("--out", type=Path, required=True)
    a = ap.parse_args()
    convert(a.annotations, a.sentences, a.split_dir, a.out)


if __name__ == "__main__":
    main()

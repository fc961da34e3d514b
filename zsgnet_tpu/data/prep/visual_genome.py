"""Visual Genome region descriptions → unified CSV.

Consumes the standard ``region_descriptions.json`` (list of images, each
with ``regions`` carrying x/y/width/height + phrase) and optionally
``objects.json`` for object names (used by the zero-shot split builder).
Regions are the grounding targets, matching the paper's VG usage.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd


def convert(
    regions_json: Path, out: Path, val_frac: float = 0.1, test_frac: float = 0.1,
    seed: int = 0, min_size: float = 16.0,
) -> None:
    with open(regions_json) as f:
        data = json.load(f)

    rows = []
    for img in data:
        img_id = img.get("id", img.get("image_id"))
        for r in img.get("regions", []):
            w, h = float(r["width"]), float(r["height"])
            if w < min_size or h < min_size:
                continue
            phrase = str(r.get("phrase", "")).strip().lower()
            if not phrase:
                continue
            x, y = float(r["x"]), float(r["y"])
            rows.append(
                {
                    "img_id": f"{img_id}.jpg",
                    "x1": x, "y1": y, "x2": x + w, "y2": y + h,
                    "query": phrase,
                }
            )

    rng = np.random.default_rng(seed)
    img_ids = sorted({r["img_id"] for r in rows})
    perm = rng.permutation(len(img_ids))
    n_val = int(len(img_ids) * val_frac)
    n_test = int(len(img_ids) * test_frac)
    val_set = {img_ids[i] for i in perm[:n_val]}
    test_set = {img_ids[i] for i in perm[n_val : n_val + n_test]}

    out_csv = out / "csv_dir"
    out_csv.mkdir(parents=True, exist_ok=True)
    splits = {"train": [], "val": [], "test": []}
    for r in rows:
        split = "val" if r["img_id"] in val_set else "test" if r["img_id"] in test_set else "train"
        splits[split].append(r)
    for split, rs in splits.items():
        pd.DataFrame(rs).to_csv(out_csv / f"{split}.csv", index=False)
        print(f"{split}: {len(rs)} regions")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regions", type=Path, required=True)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--val-frac", type=float, default=0.1)
    ap.add_argument("--test-frac", type=float, default=0.1)
    a = ap.parse_args()
    convert(a.regions, a.out, a.val_frac, a.test_frac)


if __name__ == "__main__":
    main()

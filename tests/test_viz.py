"""Visualization tooling (zsgnet_tpu.viz) — drawing + gallery."""

import numpy as np
import pytest

from zsgnet_tpu.viz import _iou_xyxy, annotate_image, draw_box, gallery


def test_draw_box_pixels():
    img = np.zeros((40, 50, 3), np.uint8)
    draw_box(img, (10, 5, 30, 20), color=(255, 0, 0), thickness=2)
    # Edges painted (top-left corner of each edge strip)…
    assert tuple(img[5, 10]) == (255, 0, 0)    # top edge
    assert tuple(img[20, 10]) == (255, 0, 0)   # bottom edge
    assert tuple(img[12, 10]) == (255, 0, 0)   # left edge
    assert tuple(img[12, 30]) == (255, 0, 0)   # right edge
    # …interior untouched.
    assert tuple(img[12, 20]) == (0, 0, 0)
    # Clipping: edges hanging off the frame draw only their visible span
    # (the left edge at x=-10 is fully off-screen; the top edge clips to
    # start at column 0), and nothing raises.
    draw_box(img, (-10, 8, 200, 200), color=(0, 255, 0))
    assert tuple(img[8, 0]) == (0, 255, 0)    # top edge, clipped to x>=0
    assert tuple(img[25, 0]) == (0, 0, 0)     # left edge off-frame: absent


def test_draw_box_rejects_bad_input():
    with pytest.raises(ValueError):
        draw_box(np.zeros((4, 4), np.uint8), (0, 0, 2, 2))
    with pytest.raises(ValueError):
        draw_box(np.zeros((4, 4, 3), np.float32), (0, 0, 2, 2))


def test_iou_xyxy():
    assert _iou_xyxy((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert _iou_xyxy((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
    assert abs(_iou_xyxy((0, 0, 10, 10), (5, 0, 15, 10)) - 1 / 3) < 1e-9


def test_annotate_image_roundtrip(tmp_path):
    img = np.full((64, 64, 3), 128, np.uint8)
    out = tmp_path / "panel.png"
    panel = annotate_image(
        img,
        {"box_xyxy": [10, 10, 40, 40], "score": 0.75},
        gt_box_xyxy=[12, 12, 42, 42],
        out_path=out,
    )
    # Input untouched (annotate copies), prediction + GT + score bar drawn.
    assert tuple(img[10, 20]) == (128, 128, 128)
    assert tuple(panel[10, 20]) == (230, 40, 40)       # pred red
    assert tuple(panel[42, 20]) == (40, 200, 60)       # gt green
    assert tuple(panel[0, 10]) == (230, 40, 40)        # score bar (filled)
    assert tuple(panel[0, 60]) == (30, 30, 30)         # score bar (empty 75%+)
    from PIL import Image

    with Image.open(out) as im:
        back = np.asarray(im.convert("RGB"))
    np.testing.assert_array_equal(back, panel)


class _StubGrounder:
    """Duck-typed Grounder: fixed boxes, records what it was asked."""

    def __init__(self, boxes):
        self.boxes = boxes
        self.calls = []

    def ground(self, images, queries):
        self.calls.append((list(map(str, images)), list(queries)))
        return [
            {"box_xyxy": list(b), "score": 0.5, "box_norm": [0, 0, 0, 0]}
            for b in self.boxes
        ]


def test_gallery_writes_iou_sorted_panels(tmp_path):
    from zsgnet_tpu.data import synthetic

    root = synthetic.generate(tmp_path, n_train=2, n_val=4, n_test=2, img_size=48)
    csv_path = root / "csv_dir" / "val.csv"
    import pandas as pd

    df = pd.read_csv(csv_path)
    # Stub predictions: row 0 = exact GT (IoU 1), rest = empty corner box.
    boxes = [[0.0, 0.0, 1.0, 1.0]] * len(df)
    boxes[0] = [df.iloc[0]["x1"], df.iloc[0]["y1"], df.iloc[0]["x2"], df.iloc[0]["y2"]]
    g = _StubGrounder(boxes)
    records = gallery(g, csv_path, tmp_path / "gal", n=4)
    assert len(records) == 4
    assert records[0]["iou"] == 1.0
    # The grounder saw image paths that exist, and the right queries.
    paths, queries = g.calls[0]
    assert all(p.endswith(".png") for p in paths)
    assert queries == [str(q) for q in df["query"][:4]]
    pngs = sorted((tmp_path / "gal").glob("*.png"))
    assert len(pngs) == 4
    # IoU-ranked: the perfect-match row lands at the LAST rank (worst first).
    assert "iou1.00_row0" in pngs[-1].name
    assert pngs[0].name.startswith("000_iou0.0")
    # Every record points at its written panel.
    assert all("png" in r and r["png"] for r in records)

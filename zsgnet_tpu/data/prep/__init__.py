"""Dataset preparation: raw annotations → the unified CSV schema.

Capability parity with the reference's data-prep tooling (SURVEY.md §2
item 12): converters for Flickr30k Entities, ReferIt/RefClef and Visual
Genome region descriptions, plus zero-shot split construction (cases
0–3). Each module is a CLI:

    python -m zsgnet_tpu.data.prep.flickr30k --annotations ... --out data/flickr30k
    python -m zsgnet_tpu.data.prep.referit --refer-dir ... --out data/refclef
    python -m zsgnet_tpu.data.prep.visual_genome --regions ... --out data/vg
    python -m zsgnet_tpu.data.prep.zero_shot_splits --help

Output schema (shared by every family — see data/dataset.py):
    img_id, x1, y1, x2, y2, query[, case]
"""

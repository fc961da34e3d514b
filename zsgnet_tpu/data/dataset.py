"""CSV grounding datasets + host-side batch pipeline — static shapes.

Capability parity with the reference's ``code/dat_loader.py``
(``ImgQuDataset``, ``get_data`` → ``DataWrap``; SURVEY.md §2 item 3, §3.6),
redesigned for the TPU input path:

  * unified CSV schema shared by all dataset families
    (ReferIt/RefClef, Flickr30k Entities + Split0/Split1, Visual Genome
    zero-shot splits): columns ``img_id`` (path relative to the image
    dir), ``x1 y1 x2 y2`` (pixel gt box in the ORIGINAL image frame),
    ``query`` (pre-tokenized text), optional ``case`` (zero-shot case id,
    -1/absent = n/a). A ``bbox`` column holding a JSON ``[x1,y1,x2,y2]``
    list is accepted as an alternative (reference CSVs use this form);
  * every sample is produced at a **fixed shape**: image resized to
    ``cfg.resize_img`` (bilinear, matching PIL), queries padded to
    ``cfg.max_qlen`` with true lengths — so the jitted train step never
    retraces and XLA sees one static program (SURVEY.md §7);
  * boxes are converted to the framework's internal convention:
    normalized [-1, 1] tlbr **(y1, x1, y2, x2)** — note the reference
    keeps pixel xyxy; normalization here means box math, anchors and the
    coordinate grid all share one coordinate system on device;
  * batches are plain dicts of NumPy arrays; device transfer/sharding is
    the trainer's job (``parallel/``). A thread-pool prefetcher overlaps
    PIL decode+resize with TPU steps (the reference uses torch DataLoader
    worker *processes*; threads suffice here because PIL's decode/resize
    release the GIL).

ImageNet normalization constants match torchvision's, so converted
reference checkpoints see identically-scaled inputs.
"""

from __future__ import annotations

import json
import queue as queue_mod
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Iterator

import numpy as np
import pandas as pd

from zsgnet_tpu.config import Config
from zsgnet_tpu.data.vocab import Vocab

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _load_image(path: Path, resize_hw: tuple[int, int]) -> tuple[np.ndarray, tuple[int, int]]:
    """→ (HWC float32 normalized image, original (H, W)).

    Decode → Pillow-bilinear resize → ImageNet normalize. PNGs and JPEGs\n    (libjpeg — the library PIL itself links, so bytes are identical) go through
    the native C++ pipeline (csrc/zsg_image.cpp — single-pass, no Python
    per-pixel overhead); other formats decode with PIL and still use the
    native resample+normalize stage. Pure-PIL fallback keeps behavior
    identical without the compiled library.
    """
    from zsgnet_tpu.data import native

    if path.suffix.lower() in (".png", ".jpg", ".jpeg"):
        out = native.image_load(path.read_bytes(), resize_hw, IMAGENET_MEAN, IMAGENET_STD)
        if out is not None:
            return out

    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        orig_w, orig_h = im.size
        arr_u8 = np.asarray(im, dtype=np.uint8)
    out2 = native.resize_normalize_rgb(arr_u8, resize_hw, IMAGENET_MEAN, IMAGENET_STD)
    if out2 is not None:
        return out2, (orig_h, orig_w)
    with Image.open(path) as im:  # pure-PIL fallback
        im = im.convert("RGB").resize((resize_hw[1], resize_hw[0]), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr, (orig_h, orig_w)


def load_image_bytes_u8(
    data: bytes, resize_hw: tuple[int, int]
) -> tuple[np.ndarray, tuple[int, int]]:
    """→ (HWC uint8 resized image, original (H, W)) from encoded bytes —
    the normalize-on-device input path (SURVEY.md §3.6 TPU equivalent):
    the device does (x/255 - mean)/std in its first fused op, so the host
    skips normalization and ships 4× fewer bytes. Native PNG/JPEG decode
    first; PIL fallback for other formats. Also the serving daemon's
    decode for request-body images (zsgnet_tpu.serve)."""
    import io

    from zsgnet_tpu.data import native

    out = native.image_load_u8(data, resize_hw)
    if out is not None:
        return out

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("RGB")
        orig_w, orig_h = im.size
        arr_u8 = np.asarray(im, dtype=np.uint8)
    out2 = native.resize_u8(arr_u8, resize_hw)
    if out2 is not None:
        return out2, (orig_h, orig_w)
    with Image.open(io.BytesIO(data)) as im:  # pure-PIL fallback
        im = im.convert("RGB").resize((resize_hw[1], resize_hw[0]), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8), (orig_h, orig_w)


def _load_image_u8(path: Path, resize_hw: tuple[int, int]) -> tuple[np.ndarray, tuple[int, int]]:
    """Path wrapper over ``load_image_bytes_u8``."""
    return load_image_bytes_u8(path.read_bytes(), resize_hw)


def _parse_box(row: pd.Series) -> np.ndarray:
    """Pixel (x1, y1, x2, y2) from either 4 columns or a JSON 'bbox' col."""
    if "bbox" in row and isinstance(row["bbox"], str):
        vals = json.loads(row["bbox"])
    elif "bbox" in row and isinstance(row["bbox"], (list, tuple)):
        vals = row["bbox"]
    else:
        vals = [row["x1"], row["y1"], row["x2"], row["y2"]]
    return np.asarray(vals, dtype=np.float32)


def normalize_box_xyxy(box_xyxy: np.ndarray, orig_hw: tuple[int, int]) -> np.ndarray:
    """Pixel xyxy (original frame) → normalized [-1,1] tlbr (y1,x1,y2,x2)."""
    h, w = float(orig_hw[0]), float(orig_hw[1])
    x1, y1, x2, y2 = box_xyxy
    return np.asarray(
        [y1 / h * 2 - 1, x1 / w * 2 - 1, y2 / h * 2 - 1, x2 / w * 2 - 1],
        dtype=np.float32,
    )


class ImgQuDataset:
    """One split of a grounding dataset backed by a CSV file.

    __getitem__ returns the reference's batch-key dict (SURVEY.md §2
    item 3): ``img`` (H, W, 3 float32), ``qvec`` (max_qlen int32),
    ``qlens`` (int32), ``annot`` (4, normalized tlbr), ``orig_annot``
    (4, pixel xyxy), ``img_size`` (2, original H W), ``idxs`` (int32),
    ``case`` (int32, -1 if not a zero-shot split).
    """

    def __init__(self, csv_path: str | Path, image_dir: str | Path, vocab: Vocab, cfg: Config):
        self.csv_path = Path(csv_path)
        self.df = pd.read_csv(csv_path)
        if "query" not in self.df.columns:
            raise ValueError(f"{csv_path}: CSV must have a 'query' column")
        self.image_dir = Path(image_dir)
        self.vocab = vocab
        self.cfg = cfg
        self.has_case = "case" in self.df.columns

    def __len__(self) -> int:
        return len(self.df)

    def queries(self) -> list[str]:
        return [str(q) for q in self.df["query"]]

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        row = self.df.iloc[i]
        loader = _load_image_u8 if self.cfg.normalize_on_device else _load_image
        img, orig_hw = loader(self.image_dir / str(row["img_id"]), self.cfg.resize_img)
        out = self.meta_item(i, orig_hw)
        out["img"] = img
        return out

    def meta_item(self, i: int, orig_hw: tuple[int, int]) -> dict[str, np.ndarray]:
        """Everything but the image, given a known original size — the
        grouped loader decodes each image ONCE and reuses its size for
        the sibling rows (GroupedDataset)."""
        row = self.df.iloc[i]
        box_xyxy = _parse_box(row)
        annot = normalize_box_xyxy(box_xyxy, orig_hw)
        ids, qlen = self.vocab.encode(str(row["query"]), self.cfg.max_qlen)
        return {
            "qvec": np.asarray(ids, dtype=np.int32),
            "qlens": np.int32(qlen),
            "annot": annot,
            "orig_annot": box_xyxy,
            "img_size": np.asarray(orig_hw, dtype=np.float32),
            "idxs": np.int32(i),
            "case": np.int32(row["case"]) if self.has_case else np.int32(-1),
        }


def collate(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    """Stack a list of sample dicts into one batch dict (reference 'collater')."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class GroupedDataset:
    """Image-grouped view for grouped multi-query training
    (``cfg.queries_per_img`` — VERDICT r3 #4).

    Each element is one (image, Q phrases) unit built by grouping CSV
    rows on ``img_id``: ``img`` (H, W, 3) decoded ONCE, ``qvec`` (Q, T),
    ``qlens``/``idxs``/``case`` (Q,), ``annot``/``orig_annot`` (Q, 4).
    Batches collate to (B, ...) / (B, Q, ...) — exactly the grouped
    train-step contract (models/zsgnet.py grouped mode). Images with
    more than Q phrases contribute multiple units (ceil(n/Q)); a short
    tail wrap-repeats the image's OWN phrases so shapes stay static —
    every real (image, phrase) pair appears at least once per epoch.
    ``pair_valid`` (Q,) marks the non-wrapped positions: training
    ignores it (seeing a real pair twice is harmless), grouped
    EVALUATION masks the repeats so every pair is counted exactly once
    (Learner._run_eval) — metrics equal the flat per-pair loader's.

    Works over both ``ImgQuDataset`` (single decode via ``meta_item``)
    and ``PackedDataset`` (memmap reads are cheap; per-row fetch).
    """

    def __init__(self, ds, img_ids, queries_per_img: int, reseed: bool = False):
        self.ds = ds
        self.cfg = ds.cfg
        self.q = int(queries_per_img)
        self._reseed = bool(reseed)
        self._epoch: int | None = None
        groups: dict[str, list[int]] = {}
        for i, gid in enumerate(img_ids):
            groups.setdefault(str(gid), []).append(i)
        self._gids = sorted(groups)
        self._groups = groups
        self._build_units(None)

    def _build_units(self, rng: np.random.Generator | None) -> None:
        """Chunk each image's phrase list into Q-sized units; ``rng``
        permutes each image's list first (epoch reseeding). The unit
        COUNT (ceil(n/Q) per image) is permutation-invariant — epoch
        length and mid-epoch resume batch indices never move."""
        self.units = []  # type: list[list[int]]
        self.n_real = []  # type: list[int]  # per unit: pre-wrap positions
        for gid in self._gids:
            idxs = self._groups[gid]
            if rng is not None:
                idxs = [idxs[k] for k in rng.permutation(len(idxs))]
            for s in range(0, len(idxs), self.q):
                chunk = idxs[s : s + self.q]
                self.n_real.append(len(chunk))
                j = 0
                while len(chunk) < self.q:  # wrap within the image
                    chunk.append(idxs[j % len(idxs)])
                    j += 1
                self.units.append(chunk)

    def reseed(self, epoch: int) -> None:
        """Re-draw phrase→unit grouping for ``epoch`` (cfg.grouped_reseed
        — VERDICT r4 weak #3a: a static grouping freezes which phrases
        co-occur in a unit across all epochs, unlike the reference's
        per-epoch pair shuffle). Deterministic in (cfg.seed, epoch) —
        identical on every host, and replaying an epoch after a
        mid-epoch resume rebuilds the identical units. Called by
        ``BatchLoader.set_epoch`` (train loaders only — eval loaders
        never reseed, keeping metrics deterministic)."""
        if not self._reseed or epoch == self._epoch:
            return
        self._epoch = epoch
        self._build_units(np.random.default_rng((int(self.cfg.seed), int(epoch))))

    def __len__(self) -> int:
        return len(self.units)

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        unit = self.units[i]
        first = self.ds[unit[0]]
        if hasattr(self.ds, "meta_item"):
            hw = (float(first["img_size"][0]), float(first["img_size"][1]))
            rows = [first] + [self.ds.meta_item(j, hw) for j in unit[1:]]
        else:  # PackedDataset: per-row fetch is a memmap copy
            rows = [first] + [self.ds[j] for j in unit[1:]]
        stack = lambda k: np.stack([r[k] for r in rows])  # noqa: E731
        return {
            "img": first["img"],
            "qvec": stack("qvec"),
            "qlens": stack("qlens"),
            "annot": stack("annot"),
            "orig_annot": stack("orig_annot"),
            "img_size": first["img_size"],
            "idxs": stack("idxs"),
            "case": stack("case"),
            "pair_valid": (np.arange(self.q) < self.n_real[i]),
        }


class BatchLoader:
    """Deterministic, shardable, prefetching batch iterator.

    Replaces torch DataLoader + DistributedSampler (SURVEY.md §2 item 11),
    with SPMD (not DDP) sharding semantics:
      * epoch ``e`` has a deterministic permutation seeded by
        (seed, e) — every host computes the same order;
      * ``bs`` is the GLOBAL batch size. All hosts enumerate the SAME
        global batch sequence in lockstep (required: every host
        participates in each jitted SPMD step); ``shard_id/num_shards``
        select which bs/num_shards-sample *slice* of each global batch
        this host materializes (fed to
        ``jax.make_array_from_process_local_data``);
      * ``drop_last=False`` pads the tail batch by wrapping and emits a
        ``valid`` mask — eval stays exact while shapes stay static;
      * ``nw`` decode threads prefetch ``prefetch_depth`` batches ahead.
    """

    def __init__(
        self,
        ds: ImgQuDataset,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        nw: int = 4,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
        prefetch_depth: int = 2,
    ):
        self.ds = ds
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.nw = max(1, nw)
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch_depth = prefetch_depth
        self.epoch = 0
        # One-shot mid-epoch resume point: the NEXT __iter__ starts at this
        # global batch index (no decode work for skipped batches — the
        # skip happens at the index list), then resets to 0. Set by the
        # Learner when restoring a cfg.ckpt_every_steps checkpoint.
        self.start_batch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.ds, "reseed"):
            # Grouped training: re-draw phrase→unit grouping per epoch
            # (no-op unless the dataset was built with reseed=True).
            self.ds.reseed(epoch)

    def _batch_indices(self) -> list[np.ndarray]:
        """The GLOBAL batch sequence — identical on every host."""
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        if self.drop_last:
            n_full = n // self.bs
            batches = [order[i * self.bs : (i + 1) * self.bs] for i in range(n_full)]
        else:
            batches = []
            for i in range(0, n, self.bs):
                chunk = order[i : i + self.bs]
                if len(chunk) < self.bs:  # wrap-pad; mask marks the tail
                    pad = order[: self.bs - len(chunk)]
                    chunk = np.concatenate([chunk, pad])
                batches.append(chunk)
        return batches

    @property
    def local_bs(self) -> int:
        if self.bs % self.num_shards:
            raise ValueError(
                f"global batch size {self.bs} not divisible by {self.num_shards} hosts"
            )
        return self.bs // self.num_shards

    def __len__(self) -> int:
        return len(self._batch_indices())

    def _assemble(self, bi: int, batches: list[np.ndarray]) -> dict[str, np.ndarray]:
        """Materialize this host's slice of global batch ``bi`` (decode +
        collate + valid mask), synchronously."""
        n = len(self.ds)
        real_count = n - (len(batches) - 1) * self.bs if batches else 0
        lb = self.local_bs
        lo, hi = self.shard_id * lb, (self.shard_id + 1) * lb
        local_idxs = batches[bi][lo:hi]  # this host's slice of the global batch
        samples = [self.ds[int(i)] for i in local_idxs]
        batch = collate(samples)
        if not self.drop_last and bi == len(batches) - 1:
            global_valid = np.arange(self.bs) < real_count
        else:
            global_valid = np.ones(self.bs, dtype=bool)
        batch["valid"] = global_valid[lo:hi]
        return batch

    def first_batch(self) -> dict[str, np.ndarray]:
        """One batch, decoded inline — NO producer thread.

        For shape-probing (Learner init traces the step on a sample
        batch): ``next(iter(dl))`` would start the prefetch producer and
        abandon it mid-epoch, wasting up to nw+prefetch_depth batches of
        decode work per construction (VERDICT r2 weak #6)."""
        return self._assemble(0, self._batch_indices())

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        batches = self._batch_indices()
        start = min(self.start_batch, len(batches))
        self.start_batch = 0  # one-shot (subsequent epochs start at 0)

        def make(bi: int, idxs: np.ndarray) -> dict[str, np.ndarray]:
            return self._assemble(bi, batches)

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that aborts when the consumer abandons the epoch."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def producer() -> None:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            # In-flight work is bounded: at most nw batches decoding plus
            # prefetch_depth completed ones waiting (in the deque head or
            # the output queue). The next batch is submitted only as
            # results drain, so a slow consumer holds O(nw+depth) decoded
            # batches — never the whole epoch.
            window = self.nw + self.prefetch_depth
            with ThreadPoolExecutor(self.nw) as pool:
                pending: deque = deque()
                for bi in range(start, len(batches)):
                    pending.append(pool.submit(make, bi, batches[bi]))
                    if len(pending) >= window and not put(pending.popleft().result()):
                        return
                while pending:
                    if not put(pending.popleft().result()):
                        return
            put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


@dataclass
class DataWrap:
    """Reference-API-compatible bundle (``code/utils.py`` DataWrap)."""

    path: Path
    train_dl: BatchLoader
    valid_dl: BatchLoader
    test_dl: BatchLoader | None
    vocab: Vocab


# Dataset registry: name → (csv subdir, image subdir). All families share the
# unified CSV schema; zero-shot splits add the 'case' column.
DATASET_LAYOUT = {
    "refclef": ("refclef/csv_dir", "refclef/images"),
    "flickr30k": ("flickr30k/csv_dir", "flickr30k/images"),
    "flickr_split0": ("flickr30k_c0/csv_dir", "flickr30k/images"),
    "flickr_split1": ("flickr30k_c1/csv_dir", "flickr30k/images"),
    "vg_split_c2": ("vg_split_c2/csv_dir", "visual_genome/images"),
    "vg_split_c3": ("vg_split_c3/csv_dir", "visual_genome/images"),
    "synthetic": ("synthetic/csv_dir", "synthetic/images"),
}


def get_data(cfg: Config, shard_id: int = 0, num_shards: int = 1) -> DataWrap:
    """Build train/val/test loaders + vocab (reference ``get_data(cfg)``).

    Expects ``<data_dir>/<ds subdir>/{train,val,test}.csv`` and the image
    dir per :data:`DATASET_LAYOUT`. The vocab is built from train queries
    and cached as ``vocab.json`` beside the CSVs. ``cfg.test_split``
    selects a different eval CSV stem (e.g. ``testA`` for the refer
    toolkit's preserved sub-splits).
    """
    if cfg.ds_to_use not in DATASET_LAYOUT:
        raise ValueError(
            f"unknown ds_to_use={cfg.ds_to_use!r}; known: {sorted(DATASET_LAYOUT)}"
        )
    csv_sub, img_sub = DATASET_LAYOUT[cfg.ds_to_use]
    root = Path(cfg.data_dir)
    csv_dir, img_dir = root / csv_sub, root / img_sub

    # cfg.vocab_splits="all" ids val/test words too (the zero-shot
    # mechanism — unseen-split words keep their GloVe rows instead of
    # collapsing onto <unk>; config.py rationale).
    if cfg.vocab_splits == "train":
        stems = ["train"]
    elif cfg.vocab_splits == "all":
        stems = list(dict.fromkeys(["train", "val", "test", cfg.test_split]))
    else:
        raise ValueError(f"vocab_splits must be train|all, got {cfg.vocab_splits!r}")
    # train.csv is mandatory — checked BEFORE any cache write, so a
    # partial data dir can never persist a near-empty word dict that
    # poisons later runs (every token would encode to <unk>).
    if not (csv_dir / "train.csv").exists():
        raise FileNotFoundError(f"missing train.csv under {csv_dir}")
    present = [s for s in stems if (csv_dir / f"{s}.csv").exists()]
    # The cache name keys on WHICH splits fed the dict ("all" mode):
    # prepping testA.csv after a cached build must rebuild, not silently
    # reuse a dict that is missing exactly the unseen-split words.
    vocab_path = csv_dir / (
        "vocab.json" if cfg.vocab_splits == "train"
        else "vocab_all_" + "-".join(present) + ".json"
    )
    if vocab_path.exists():
        vocab = Vocab.load(vocab_path)
    else:
        queries: list[str] = []
        for stem in present:
            queries.extend(
                str(q) for q in pd.read_csv(csv_dir / f"{stem}.csv")["query"]
            )
        vocab = Vocab.build(queries)
        vocab.save(vocab_path)

    def loader(
        split: str, shuffle: bool, drop_last: bool, grouped: bool = False
    ) -> BatchLoader | None:
        csv_path = csv_dir / f"{split}.csv"
        if not csv_path.exists():
            return None
        ds = ImgQuDataset(csv_path, img_dir, vocab, cfg)
        img_ids = ds.df["img_id"] if "img_id" in ds.df.columns else None
        if cfg.use_packed_cache:
            from zsgnet_tpu.data.packed import PackedDataset

            h, w = cfg.resize_img
            ds = PackedDataset(ds, csv_dir / f"packed_{split}_{h}x{w}")
        if grouped and cfg.queries_per_img > 1:
            # Grouped multi-query batches: one backbone pass per image
            # for Q phrases (config.py queries_per_img). Training
            # requires an img_id column; eval splits fall back to flat
            # per-pair batches without one (grouping eval is purely a
            # throughput optimization — wrap-repeated pairs are masked
            # via pair_valid, so metrics are identical either way).
            if img_ids is None:
                if split == "train":
                    raise ValueError(
                        "queries_per_img > 1 needs an img_id column"
                    )
            else:
                # Epoch reseeding on the TRAIN split only: eval grouping
                # stays static so metrics are deterministic run to run.
                ds = GroupedDataset(
                    ds, img_ids, cfg.queries_per_img,
                    reseed=cfg.grouped_reseed and split == "train",
                )
        return BatchLoader(
            ds, cfg.bs, shuffle=shuffle, seed=cfg.seed, nw=cfg.nw,
            drop_last=drop_last, shard_id=shard_id, num_shards=num_shards,
            prefetch_depth=cfg.prefetch_depth,
        )

    grouped = cfg.queries_per_img > 1

    train_dl = loader("train", shuffle=True, drop_last=True, grouped=grouped)
    valid_dl = loader("val", shuffle=False, drop_last=False, grouped=grouped)
    test_dl = loader(cfg.test_split, shuffle=False, drop_last=False, grouped=grouped)
    if train_dl is None or valid_dl is None:
        raise FileNotFoundError(f"missing train.csv/val.csv under {csv_dir}")
    return DataWrap(path=root, train_dl=train_dl, valid_dl=valid_dl, test_dl=test_dl, vocab=vocab)

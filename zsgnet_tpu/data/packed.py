"""Packed dataset cache — decode once, stream forever.

A single host core decodes ~150 PNG/s (csrc pipeline) while one v5e chip
trains at ~900 queries/s: the host loses by 6×. This module removes
decode from the steady-state path (the TPU analog of the reference's
num-worker scaling, which this box cannot do — SURVEY.md §3.6): a
one-time pass writes every sample's resized uint8 image into a memmap
(`imgs.u8` (N, H, W, 3)) plus an `meta.npz` of the already-tokenized
query/box tensors. Epochs then assemble batches by fancy-indexing the
memmap — pure memcpy, >10k samples/s on one core.

Cache key includes the resize resolution, CSV row count AND a content
hash of the CSV bytes — editing rows without changing the count
invalidates the cache (ADVICE r1). Builds are atomic (tmp files +
``os.replace``, key written last) and guarded by an exclusive lock file
so concurrent processes on a shared filesystem don't race: one builds,
the rest wait for the key to appear.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path

import numpy as np

from zsgnet_tpu.config import Config
from zsgnet_tpu.data.dataset import ImgQuDataset, _load_image_u8


class PackedDataset:
    """Duck-type of ImgQuDataset backed by the memmap cache.

    __getitem__ returns the same dict contract with ``img`` uint8
    (normalize-on-device path; the cache stores u8 regardless of
    cfg.normalize_on_device and the float path normalizes on read).
    """

    def __init__(self, ds: ImgQuDataset, cache_dir: str | Path):
        self.cfg = ds.cfg
        self.cache_dir = Path(cache_dir)
        self._build_if_needed(ds)
        meta = np.load(self.cache_dir / "meta.npz")
        self.meta = {k: meta[k] for k in meta.files}
        n = len(self.meta["qlens"])
        h, w = self.cfg.resize_img
        self.imgs = np.memmap(
            self.cache_dir / "imgs.u8", dtype=np.uint8, mode="r",
            shape=(n, h, w, 3),
        )

    def _key(self, ds: ImgQuDataset) -> dict:
        h, w = self.cfg.resize_img
        csv_path = getattr(ds, "csv_path", None)
        csv_md5 = (
            hashlib.md5(Path(csv_path).read_bytes()).hexdigest()
            if csv_path is not None and Path(csv_path).exists()
            else ""
        )
        return {"n": len(ds), "h": h, "w": w, "csv_md5": csv_md5, "version": 2}

    def _key_matches(self, ds: ImgQuDataset) -> bool:
        key_path = self.cache_dir / "key.json"
        if not key_path.exists():
            return False
        try:
            return json.loads(key_path.read_text()) == self._key(ds)
        except (json.JSONDecodeError, OSError):
            return False

    def _build_if_needed(self, ds: ImgQuDataset) -> None:
        if self._key_matches(ds):
            return
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        lock_path = self.cache_dir / "build.lock"
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            # Another process is building (or died mid-build): wait for the
            # key, falling back to building ourselves if the lock goes stale.
            deadline = time.monotonic() + 3600.0
            while time.monotonic() < deadline:
                if self._key_matches(ds):
                    return
                if not lock_path.exists():  # builder finished or crashed
                    self._build_if_needed(ds)
                    return
                time.sleep(0.5)
            raise TimeoutError(f"packed-cache build lock stuck: {lock_path}")
        try:
            self._build(ds)
        finally:
            lock_path.unlink(missing_ok=True)

    def _build(self, ds: ImgQuDataset) -> None:
        h, w = self.cfg.resize_img
        n = len(ds)
        imgs = np.memmap(
            self.cache_dir / "imgs.u8.tmp", dtype=np.uint8, mode="w+",
            shape=(n, h, w, 3),
        )
        meta: dict[str, list] = {
            k: [] for k in ("qvec", "qlens", "annot", "orig_annot", "img_size", "case")
        }
        for i in range(n):
            row = ds.df.iloc[i]
            img, orig_hw = _load_image_u8(
                ds.image_dir / str(row["img_id"]), self.cfg.resize_img
            )
            imgs[i] = img
            from zsgnet_tpu.data.dataset import _parse_box, normalize_box_xyxy

            box_xyxy = _parse_box(row)
            ids, qlen = ds.vocab.encode(str(row["query"]), self.cfg.max_qlen)
            meta["qvec"].append(np.asarray(ids, np.int32))
            meta["qlens"].append(np.int32(qlen))
            meta["annot"].append(normalize_box_xyxy(box_xyxy, orig_hw))
            meta["orig_annot"].append(box_xyxy)
            meta["img_size"].append(np.asarray(orig_hw, np.float32))
            meta["case"].append(
                np.int32(row["case"]) if ds.has_case else np.int32(-1)
            )
        imgs.flush()
        del imgs
        np.savez(
            self.cache_dir / "meta.npz.tmp",
            **{k: np.stack(v) for k, v in meta.items()},
        )
        # Atomic publish: data files first, the key last (a crash mid-build
        # leaves no valid key, so the next run rebuilds).
        os.replace(self.cache_dir / "imgs.u8.tmp", self.cache_dir / "imgs.u8")
        # np.savez appends .npz when the name lacks it — handle both.
        tmp_npz = self.cache_dir / "meta.npz.tmp"
        if not tmp_npz.exists():
            tmp_npz = self.cache_dir / "meta.npz.tmp.npz"
        os.replace(tmp_npz, self.cache_dir / "meta.npz")
        (self.cache_dir / "key.json").write_text(json.dumps(self._key(ds)))

    def __len__(self) -> int:
        return len(self.meta["qlens"])

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        img = np.asarray(self.imgs[i])
        if not self.cfg.normalize_on_device:
            from zsgnet_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

            img = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return {
            "img": img,
            "qvec": self.meta["qvec"][i],
            "qlens": self.meta["qlens"][i],
            "annot": self.meta["annot"][i],
            "orig_annot": self.meta["orig_annot"][i],
            "img_size": self.meta["img_size"][i],
            "idxs": np.int32(i),
            "case": self.meta["case"][i],
        }

"""Single-shot grounding inference API — image + query → box.

The north star's serving path (BASELINE.json: "inference is single-shot
per image-query pair with no proposal stage"). ``Grounder`` wraps a
trained checkpoint behind one jitted call; queries batch transparently
(padded to the compiled batch size, so any request count ≤ bs reuses one
compiled program).

CLI:
    python -m zsgnet_tpu.predict <ckpt_dir> <image> "<query>" [--key=val ...]

prints the predicted box in original-image pixel coordinates
(x1 y1 x2 y2) plus the match score. Bulk mode streams a dataset-format
CSV (img_id,query — bbox columns ignored) to JSONL predictions:

    python -m zsgnet_tpu.predict <ckpt_dir> --csv=split.csv
        --img_dir=images [--out=preds.jsonl] [--batch_size=32]
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.config import Config, get_default_cfg
from zsgnet_tpu.data.dataset import _load_image_u8
from zsgnet_tpu.data.vocab import Vocab, tokenize
from zsgnet_tpu.models.zsgnet import anchor_components_for, get_default_net
from zsgnet_tpu.ops.level_ops import decode_best_box_levels

# Measured crossover between the two exact head parameterizations
# (BASELINE.md canvas A/B): below this batch the packed canvas head wins
# (B=1: 5.6→1.9 ms), above it the per-level head (+ int8) wins.
LATENCY_BATCH_MAX = 16


def _get_embedding(variables: dict):
    return variables["params"]["query_enc"]["embed"]["embedding"]


def _set_embedding(variables: dict, table) -> dict:
    """Functionally replace the embedding table leaf (dict or FrozenDict)."""
    from zsgnet_tpu.data.embeddings import set_embedding_param

    return {**dict(variables), "params": set_embedding_param(variables["params"], table)}


def prep_chunk(cfg: Config, vocab: Vocab, bs: int, images: list, queries: list):
    """Pad one request chunk to the compiled batch: (imgs u8, qvec, qlens,
    orig sizes, real count). Shared by ``Grounder`` and the exported-artifact
    server (``zsgnet_tpu.export``) so both serve byte-identical batches."""
    h, w = cfg.resize_img
    k = len(images)
    imgs = np.zeros((bs, h, w, 3), np.uint8)
    sizes = np.ones((bs, 2), np.float32)
    for j, im in enumerate(images):
        if isinstance(im, np.ndarray):
            arr = im.astype(np.uint8)
            if arr.shape[:2] != (h, w):
                raise ValueError("array inputs must be pre-resized")
            imgs[j], sizes[j] = arr, (arr.shape[0], arr.shape[1])
        else:
            imgs[j], orig_hw = _load_image_u8(Path(im), (h, w))
            sizes[j] = orig_hw
    qvec = np.zeros((bs, cfg.max_qlen), np.int32)
    qlens = np.ones((bs,), np.int32)
    for j, q in enumerate(queries):
        ids, ln = vocab.encode(q, cfg.max_qlen)
        qvec[j], qlens[j] = ids, ln
    return imgs, qvec, qlens, sizes, k


def chunk_results(boxes, scores, sizes, k: int) -> list[dict]:
    """Decode one padded chunk's device output into per-request dicts
    (normalized tlbr + original-pixel xyxy + score)."""
    boxes = np.asarray(boxes)[:k]
    scores = np.asarray(scores)[:k]
    out: list[dict] = []
    for j in range(k):
        oh, ow = sizes[j]
        y1, x1, y2, x2 = boxes[j]
        out.append(
            {
                "box_norm": [float(v) for v in boxes[j]],
                "box_xyxy": [
                    float((x1 + 1) * ow / 2), float((y1 + 1) * oh / 2),
                    float((x2 + 1) * ow / 2), float((y2 + 1) * oh / 2),
                ],
                "score": float(scores[j]),
            }
        )
    return out


class OpenVocabMixin:
    """Open-vocabulary serving state machine, shared by the live
    ``Grounder`` and the v3 (weights-as-arguments) ``ExportedGrounder``
    (zsgnet_tpu/export.py) — the embedding table is a call INPUT there,
    so unseen-word rows can be assigned at serving time on artifacts
    too (VERDICT r3 missing #3: the zero-shot story now survives the
    deployment format).

    Host attrs a user class must set up (Grounder.__init__ /
    ExportedGrounder.load): ``cfg``, ``vocab``, ``variables``,
    ``oov_slots``, ``glove_path``, ``_glove_offsets``, ``_oov_warned``,
    ``_emb_host`` (the padded (V+S, D) host table), ``_emb_scale``,
    ``_vocab_rows``."""

    def _build_glove_index(self) -> None:
        """Scan ``glove_path`` once into a word → byte-offset index so a
        later lookup is one seek+readline. Called at construction time."""
        offsets: dict[str, int] = {}
        off = 0
        with open(self.glove_path, "rb") as f:
            for line in f:
                tok = line.split(b" ", 1)[0].decode("utf-8", "replace")
                offsets.setdefault(tok, off)
                off += len(line)
        self._glove_offsets = offsets

    def _lookup_glove(self, word: str) -> "np.ndarray | None":
        """GloVe row for ``word`` via the byte-offset index."""
        if not self.glove_path:
            return None
        if self._glove_offsets is None:
            self._build_glove_index()
        off = self._glove_offsets.get(word)
        if off is None:
            return None
        with open(self.glove_path, "rb") as f:
            f.seek(off)
            parts = f.readline().decode("utf-8").rstrip().split(" ")
        if len(parts) < self.cfg.emb_dim + 1:
            return None  # header/malformed row
        return np.asarray(parts[1 : self.cfg.emb_dim + 1], np.float32)

    def _ensure_vocab(self, queries: list[str]) -> None:
        """Assign reserved embedding rows to unseen query words (no-op
        without ``oov_slots``). One device re-transfer per call at most."""
        if not self.oov_slots:
            return
        added = False
        for q in queries:
            # encode() truncates at max_qlen — tokens past it never reach
            # the model, so they must not consume slots either
            for w in tokenize(q)[: self.cfg.max_qlen]:
                if w in self.vocab.word_to_id:
                    continue
                if len(self.vocab) >= self._vocab_rows:
                    if not self._oov_warned:
                        print(
                            f"{type(self).__name__}: all {self.oov_slots} OOV "
                            "slots in use; further unseen words fall back to <unk>"
                        )
                        self._oov_warned = True
                    continue
                idx = self.vocab.add_word(w)
                vec = self._lookup_glove(w)
                if vec is None:
                    # deterministic per-word init: distinct unseen words
                    # stay distinguishable even without a GloVe file
                    import zlib

                    rng = np.random.default_rng(zlib.crc32(w.encode()))
                    vec = rng.normal(0, self._emb_scale, self._emb_host.shape[1])
                self._emb_host[idx] = vec.astype(np.float32)
                added = True
        if added:
            self.variables = _set_embedding(
                self.variables, jnp.asarray(self._emb_host)
            )


class Grounder(OpenVocabMixin):
    """Load-once, call-many grounding predictor."""

    def __init__(
        self, cfg: Config, vocab: Vocab, variables: dict, batch_size: int = 8,
        quantize: bool = False, quant_percentile: float = 0.999,
        bucket_sizes: tuple[int, ...] | None = None,
        mesh: "jax.sharding.Mesh | None" = None,
        oov_slots: int = 0, glove_path: "str | Path | None" = None,
    ):
        # Data-parallel serving: with a 1-D mesh (parallel.make_mesh),
        # weights replicate and every batch splits over its leading axis —
        # eval has no cross-batch ops (BN uses running stats), so XLA
        # partitions the whole forward with zero collectives and
        # throughput scales ≈ linearly with chips. Buckets are kept to
        # multiples of the DATA axis so every shard stays static-shaped.
        # A 2-D (data, spatial) mesh (cfg.mesh_spatial > 1) additionally
        # shards the image HEIGHT: GSPMD inserts the conv halo exchanges
        # and batch-1 latency scales over chips — the case data
        # parallelism cannot touch. Forward-only, so this is safe for
        # BOTH backbones (the jax-0.9 partitioner bugs are grad-only;
        # tools/check_spatial_gspmd.py) and equality-tested against the
        # single-device Grounder in tests/test_spatial.py.
        self._mesh = mesh
        # Serving default: the canvas-packed head (models/canvas.py) is
        # 2–3× faster below B≈16 (B=1: 5.6→1.9 ms, B=8: 5.7→2.8 ms on
        # v5e; BASELINE.md), while the per-level head wins at throughput
        # batches. Exact reparam, identical params — pick by batch size.
        if batch_size <= LATENCY_BATCH_MAX and cfg.use_same_atb:
            cfg = cfg.replace(head_canvas=True)
        # int8 serving (models/quant.py): calibrates activation scales on
        # the FIRST ground() batch (or an explicit .calibrate() call),
        # then serves int8 convs. Same checkpoint either way. A cfg that
        # already says quant_mode="int8" implies quantize (serving
        # uncalibrated int8 would silently mis-scale every conv).
        self.quantize = quantize or cfg.quant_mode == "int8"
        if self.quantize and cfg.head_canvas:
            # Latency batches are dispatch/VPU-bound, not MXU-bound:
            # int8's quantize/dequantize passes make canvas serving
            # SLOWER (B=8: 3.74 ms int8-backbone vs 2.78 ms bf16), and
            # the packed canvas would also funnel all pyramid levels
            # through one head scale (the accuracy trap BASELINE.md
            # documents). bf16 canvas stays the latency mode; int8 kicks
            # in at throughput batch sizes. The cfg must agree — leaving
            # quant_mode="int8" here would build int8 convs that nothing
            # ever calibrates (ADVICE r2 #1).
            if quantize:
                print(
                    "Grounder: quantize=True ignored at latency batch sizes "
                    f"(batch_size={batch_size} <= 16 uses the bf16 canvas head; "
                    "pass batch_size>16 for int8 throughput serving)"
                )
            self.quantize = False
            cfg = cfg.replace(quant_mode="off")
        if self.quantize:
            cfg = cfg.replace(quant_mode="int8")
        self.cfg = cfg
        self.vocab = vocab
        # Open-vocabulary serving (beyond-reference — the paper's zero-shot
        # claim made real at serving time): pre-reserve ``oov_slots``
        # embedding rows so query words outside the training dict get
        # DISTINCT, meaningful vectors — the word's GloVe row when
        # ``glove_path`` is set (the mechanism ZSGNet's unseen-word splits
        # ride on), else a deterministic per-word init — instead of every
        # unseen word collapsing onto the one trained <unk> row. TPU-
        # static by construction: the table is padded ONCE here, so
        # assigning a word later is a host-side row write + re-transfer of
        # the (V+S, D) leaf — no recompile, no shape change. Words assign
        # first-come; exhausted slots fall back to <unk> with a warning.
        self.oov_slots = int(oov_slots)
        self.glove_path = str(glove_path) if glove_path else None
        self._oov_warned = False
        self._glove_offsets: dict[str, int] | None = None
        if self.oov_slots:
            emb = np.asarray(_get_embedding(variables), np.float32)
            if emb.shape[0] != len(vocab):
                raise ValueError(
                    f"embedding table has {emb.shape[0]} rows for a "
                    f"{len(vocab)}-word vocab — cannot reserve OOV slots"
                )
            # scale convention matches data/embeddings.py OOV init
            self._emb_scale = float(emb.std()) * 0.6 or 0.1
            self._emb_host = np.concatenate(
                [emb, np.zeros((self.oov_slots, emb.shape[1]), np.float32)]
            )
            variables = _set_embedding(variables, jnp.asarray(self._emb_host))
            if self.glove_path:
                # Eager: the full-file offset scan must happen at load
                # time, not inside the daemon's serving thread on the
                # first unseen word (glove.840B is ~2 GB / 2.2M lines).
                self._build_glove_index()
        self._vocab_rows = len(vocab) + self.oov_slots
        self.variables = variables
        self.bs = batch_size
        # Shape buckets: a partially-filled chunk pads to the SMALLEST
        # compiled batch that fits instead of always the full bs — a lone
        # request at bs=32 otherwise ships 32 images' worth of bytes to
        # ground one (8.6 MB → 270 KB on the 300² config; measured daemon
        # latency 291 → 123 ms over the 56 MB/s tunnel — BASELINE.md).
        # Each bucket is one extra jit compile, cached after first use.
        # bucket_sizes=(batch_size,) restores the single-shape behavior.
        # Buckets split over the batch-sharding axis only (axis 0 = data);
        # a spatial axis shards H, not the batch, so it doesn't constrain
        # bucket sizes.
        n_shard = int(mesh.shape[mesh.axis_names[0]]) if mesh is not None else 1
        if batch_size % n_shard:
            raise ValueError(
                f"batch_size={batch_size} must divide over the {n_shard}-device mesh"
            )
        if bucket_sizes is None:
            bucket_sizes = tuple(
                b for b in (1, 2, 4, 8, 16, 32, 64, 128)
                if b < batch_size and b % n_shard == 0
            )
        elif any(b % n_shard for b in bucket_sizes):
            raise ValueError(
                f"bucket_sizes {bucket_sizes} must all divide over the "
                f"{n_shard}-device mesh"
            )
        self.bucket_sizes = tuple(sorted({*bucket_sizes, batch_size}))
        self.model = get_default_net(cfg, vocab_size=self._vocab_rows)
        # Calibration clips activation scales at a high |x| quantile —
        # pure-max calibration collapses accuracy on trained nets
        # (models/quant.py).
        self._calib_model = (
            get_default_net(
                cfg.replace(quant_mode=f"calib@{quant_percentile}"),
                vocab_size=self._vocab_rows,
            )
            if self.quantize
            else None
        )
        anchor_comps = anchor_components_for(cfg)
        from zsgnet_tpu.utils.compile import compiler_options_for

        def _make_infer(model):
            def _infer(variables, img, qvec, qlens):
                out = model.apply(
                    variables, {"img": img, "qvec": qvec, "qlens": qlens}, train=False
                )
                box, score = decode_best_box_levels(
                    out["att_levels"], out["delta_levels"], anchor_comps
                )
                return box, jax.nn.sigmoid(score)

            return _infer

        # Raw function kept for jax.export (zsgnet_tpu.export): StableHLO
        # cannot carry compiler_options, so the exporter re-jits this
        # options-free instead of nesting the tuned jit below.
        self._infer_fn = _make_infer(self.model)
        jit_kw: dict = {"compiler_options": compiler_options_for(cfg)}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = mesh.axis_names
            batch_sh = NamedSharding(mesh, P(axes[0]))
            # 2-D mesh: image height (NHWC dim 1) over the spatial axis.
            img_sh = (
                NamedSharding(mesh, P(axes[0], axes[1]))
                if len(axes) > 1
                else batch_sh
            )
            rep = NamedSharding(mesh, P())
            jit_kw["in_shardings"] = (rep, img_sh, batch_sh, batch_sh)
            jit_kw["out_shardings"] = (batch_sh, batch_sh)
        jit_opts = partial(jax.jit, **jit_kw)
        self._infer = jit_opts(self._infer_fn)
        # Per-bucket head selection: a throughput Grounder (bs > 16) still
        # serves its small buckets through the canvas head — the same
        # exact reparam the latency mode uses (same params, 2.9× at B=1).
        # Large buckets keep the per-level head. Quantized Grounders are
        # excluded: canvas would have to serve bf16 (int8 canvas is both
        # slower and the one-head-scale accuracy trap), and an int8 daemon
        # whose answers change with instantaneous load is worse than the
        # few ms the canvas saves — int8 serves every bucket per-level.
        # The bucket compile count is unchanged; only the graph per small
        # bucket differs.
        self._latency_model = None
        self._infer_latency_fn = None
        self._infer_latency = None
        if (
            cfg.use_same_atb
            and not cfg.head_canvas
            and not self.quantize
            and min(self.bucket_sizes) <= LATENCY_BATCH_MAX
        ):
            lat_cfg = cfg.replace(head_canvas=True, quant_mode="off")
            self._latency_model = get_default_net(lat_cfg, vocab_size=self._vocab_rows)
            self._infer_latency_fn = _make_infer(self._latency_model)
            self._infer_latency = jit_opts(self._infer_latency_fn)

    def warmup(self, multiquery: bool = False) -> None:
        """Compile every shape bucket now instead of on first use — cold
        compiles run seconds to minutes (remote-compiler tunnels), and a
        daemon that lazily compiles turns its first request per bucket
        into a latency cliff. ``multiquery=True`` additionally compiles
        the shared-backbone ``ground_image`` buckets (image batch 1 ×
        each query bucket — distinct programs). Quantized Grounders must
        be calibrated first: grounding zeros would bake garbage
        activation scales, so an uncalibrated int8 Grounder skips (and
        says so)."""
        if self.quantize and "quant" not in self.variables:
            print(
                "Grounder.warmup: skipped — int8 serving calibrates on the "
                "first REAL batch; warm up after .calibrate()/.ground()"
            )
            return
        h, w = self.cfg.resize_img
        zero = np.zeros((h, w, 3), np.uint8)
        # "<unk>" is always in-vocab — warmup must not consume OOV slots
        for b in self.bucket_sizes:
            self.ground([zero] * b, ["<unk>"] * b)
        if multiquery and self._mesh is None:
            for b in self.bucket_sizes:
                self.ground_image(zero, ["<unk>"] * b)

    def calibrate(self, img: "np.ndarray", qvec: "np.ndarray", qlens: "np.ndarray") -> None:
        """Record per-conv activation scales from one representative batch
        (running |max| into the 'quant' collection)."""
        _, qvars = self._calib_model.apply(
            self.variables,
            {"img": jnp.asarray(img), "qvec": jnp.asarray(qvec), "qlens": jnp.asarray(qlens)},
            train=False, mutable=["quant"],
        )
        self.variables = {**self.variables, "quant": qvars["quant"]}

    # _build_glove_index / _lookup_glove / _ensure_vocab: OpenVocabMixin.

    @classmethod
    def from_checkpoint(
        cls, ckpt_dir: str | Path, vocab_path: str | Path | None = None,
        cfg: Config | None = None, batch_size: int = 8, quantize: bool = False,
        cfg_overrides: dict | None = None,
        mesh: "jax.sharding.Mesh | None" = None,
        oov_slots: int = 0, glove_path: "str | Path | None" = None,
    ) -> "Grounder":
        """Serve from a bare checkpoint directory.

        Checkpoint dirs are self-contained (VERDICT r2 #2): the Learner
        persists ``cfg.json`` + ``vocab.json`` beside the weights, so
        neither ``vocab_path`` nor ``cfg`` is required — the trained
        architecture (``head_ch``, ``fpn_ch``, ``resize_img``,
        ``bn_variance``…) restores from the dir. Explicit args win:
        ``cfg`` replaces the sidecar wholesale; ``cfg_overrides`` patches
        individual keys on top of whichever base applies.
        """
        from zsgnet_tpu.train.checkpoint import (
            CheckpointManager,
            find_sidecar,
            load_sidecar_cfg,
        )

        if cfg is None:
            cfg = load_sidecar_cfg(ckpt_dir)
            if cfg is None:
                print(
                    f"Grounder: no cfg.json beside {ckpt_dir} — assuming the "
                    "default architecture (pre-r3 checkpoint?)"
                )
                cfg = get_default_cfg()
        if cfg_overrides:
            cfg = cfg.replace(**cfg_overrides)
        if vocab_path is None:
            vocab_path = find_sidecar(ckpt_dir, "vocab.json")
            if vocab_path is None:
                raise FileNotFoundError(
                    f"no vocab.json beside {ckpt_dir}; pass vocab_path= "
                    "(checkpoints saved by r3+ Learners include it)"
                )
        vocab = Vocab.load(vocab_path)
        restored = CheckpointManager(ckpt_dir).restore()
        # EMA checkpoints (cfg.ema_decay > 0) carry the smoothed serving
        # weights beside the raw training params — serve those: the best-
        # checkpoint selection was made on EMA val metrics.
        ema = restored.get("ema_params")
        variables = {"params": ema if ema else restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        return cls(
            cfg, vocab, variables, batch_size, quantize=quantize, mesh=mesh,
            oov_slots=oov_slots, glove_path=glove_path,
        )

    def ground_image(
        self, image: "str | Path | np.ndarray", queries: list[str]
    ) -> list[dict]:
        """Ground N queries against ONE image with a single backbone pass
        per chunk — the dominant grounding workload shape (Flickr30k
        Entities averages ~5 phrases per image; the reference recomputes
        the backbone for every pair).

        Exactness: ``ZSGNet``'s decomposed fusion head broadcasts a
        batch-1 visual stream against a batch-N language stream — the
        conv0 visual term, the grid term, and the whole backbone+FPN run
        once at image batch 1 and broadcast into the per-query head sum
        (models/zsgnet.py PredictionHead), so the math is identical to
        tiling the image N times. Only the head convs 1..out and the
        BiLSTM pay per query. Equality-tested against the per-pair path
        in tests/test_multiquery.py; chip numbers in BASELINE.md.

        Also a transport win for remote serving: callers ship ONE image's
        bytes instead of N copies (the daemon's '"queries": [...]' form).

        Query counts chunk over the same shape buckets as ``ground``;
        each chunk is one program invocation (one backbone pass). Mesh
        Grounders fall back to the per-pair path — a batch-1 image can't
        shard over the data axis.
        """
        if self._mesh is not None:
            return self.ground([image] * len(queries), queries)
        n = len(queries)
        if n == 0:
            return []
        self._ensure_vocab(queries)
        h, w = self.cfg.resize_img
        if isinstance(image, np.ndarray):
            arr = image.astype(np.uint8)
            if arr.shape[:2] != (h, w):
                raise ValueError("array inputs must be pre-resized")
            img, orig_hw = arr, (arr.shape[0], arr.shape[1])
        else:
            img, orig_hw = _load_image_u8(Path(image), (h, w))
        img_dev = jnp.asarray(img[None])  # (1, H, W, 3)
        out: list[dict] = []
        for start in range(0, n, self.bs):
            chunk = queries[start : start + self.bs]
            pad_to = next(b for b in self.bucket_sizes if b >= len(chunk))
            qvec = np.zeros((pad_to, self.cfg.max_qlen), np.int32)
            qlens = np.ones((pad_to,), np.int32)
            for j, q in enumerate(chunk):
                qvec[j], qlens[j] = self.vocab.encode(q, self.cfg.max_qlen)
            if self.quantize and "quant" not in self.variables:
                self.calibrate(img[None], qvec, qlens)
            infer = (
                self._infer_latency
                if self._infer_latency is not None and pad_to <= LATENCY_BATCH_MAX
                else self._infer
            )
            boxes, scores = infer(
                self.variables, img_dev, jnp.asarray(qvec), jnp.asarray(qlens)
            )
            sizes = np.tile(np.asarray(orig_hw, np.float32), (pad_to, 1))
            out.extend(chunk_results(boxes, scores, sizes, len(chunk)))
        return out

    def ground(
        self, images: list[str | Path | np.ndarray], queries: list[str]
    ) -> list[dict]:
        """→ per pair: {"box_xyxy": pixel [x1,y1,x2,y2], "score": float,
        "box_norm": normalized tlbr}. Accepts image paths or HWC uint8/
        float arrays (arrays are assumed already resized)."""
        if len(images) != len(queries):
            raise ValueError("images and queries must pair up")
        n = len(images)
        if n == 0:
            return []
        self._ensure_vocab(queries)
        # Host/device pipeline: jax dispatch is async, and the blocking
        # point is the np.asarray readback in chunk_results — deferring it
        # behind a small window lets chunk i+1's host prep (image decode,
        # padding) overlap chunk i's device execution. Depth 2 bounds the
        # in-flight padded inputs (~2 full batches of HBM + host bytes).
        from collections import deque

        out: list[dict] = []
        in_flight: deque = deque()
        for start in range(0, n, self.bs):
            k_chunk = min(self.bs, n - start)
            pad_to = next(b for b in self.bucket_sizes if b >= k_chunk)
            imgs, qvec, qlens, sizes, k = prep_chunk(
                self.cfg, self.vocab, pad_to,
                images[start : start + self.bs], queries[start : start + self.bs],
            )
            if self.quantize and "quant" not in self.variables:
                self.calibrate(imgs, qvec, qlens)
            infer = (
                self._infer_latency
                if self._infer_latency is not None and pad_to <= LATENCY_BATCH_MAX
                else self._infer
            )
            boxes, scores = infer(
                self.variables, jnp.asarray(imgs), jnp.asarray(qvec), jnp.asarray(qlens)
            )
            in_flight.append((boxes, scores, sizes, k))
            if len(in_flight) > 2:
                out.extend(chunk_results(*in_flight.popleft()))
        while in_flight:
            out.extend(chunk_results(*in_flight.popleft()))
        return out


def batch_predict(
    grounder: Grounder, csv_path: str | Path, img_dir: str | Path,
    out_path: str | Path, block_batches: int = 4, grouped: bool = True,
) -> int:
    """Offline bulk inference: dataset-format CSV → JSONL predictions.

    The CSV is the same format the dataset splits use (``img_id`` path
    relative to ``img_dir`` + ``query``; any bbox/case columns are
    ignored), so a user can point this straight at a split file. Rows
    stream in blocks of ``block_batches`` device batches — large enough
    that the depth-2 host/device pipeline overlaps prep with execution,
    small enough to bound memory. Returns the number of rows written;
    each JSONL line carries ``img_id``/``query``/``box_xyxy``/
    ``box_norm``/``score``.

    ``grouped`` (default, r5): within each block, images carrying ≥2
    phrases route through ``ground_image`` — ONE backbone pass and ONE
    host decode per image instead of per pair (the grouped-training
    mechanism applied to bulk offline inference; Flickr30k splits
    average ~5 phrases/image). Single-phrase rows still batch through
    the flat ``ground()`` path, which packs them densely — the best
    regime for each shape. Results are identical either way
    (ground_image ≡ ground, tests/test_multiquery.py); output rows stay
    in CSV order.
    """
    import json

    import pandas as pd

    df = pd.read_csv(csv_path)
    missing = {"img_id", "query"} - set(df.columns)
    if missing:
        raise ValueError(f"{csv_path}: CSV is missing columns {sorted(missing)}")
    img_dir = Path(img_dir)
    span = block_batches * grounder.bs
    n = 0
    with open(out_path, "w") as f:
        for start in range(0, len(df), span):
            rows = df.iloc[start : start + span]
            paths = [img_dir / str(p) for p in rows["img_id"]]
            queries = [str(q) for q in rows["query"]]
            results: list = [None] * len(rows)
            if grouped:
                by_img: dict[str, list[int]] = {}
                for j, p in enumerate(rows["img_id"]):
                    by_img.setdefault(str(p), []).append(j)
                flat_idx = [g[0] for g in by_img.values() if len(g) == 1]
                for res_j, res in zip(
                    flat_idx,
                    grounder.ground([paths[j] for j in flat_idx],
                                    [queries[j] for j in flat_idx]),
                ):
                    results[res_j] = res
                for g in by_img.values():
                    if len(g) > 1:  # one backbone pass + one decode
                        for j, res in zip(
                            g, grounder.ground_image(paths[g[0]],
                                                     [queries[j] for j in g])
                        ):
                            results[j] = res
            else:
                results = grounder.ground(paths, queries)
            for (_, row), res in zip(rows.iterrows(), results):
                f.write(json.dumps(
                    {"img_id": str(row["img_id"]), "query": str(row["query"]), **res}
                ) + "\n")
                n += 1
    return n


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    overrides = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    vocab_path = overrides.pop("vocab", None)
    quantize = overrides.pop("quantize", "false").lower() in ("1", "true", "yes")
    # open-vocabulary serving: --oov_slots=64 [--glove=glove.6B.300d.txt]
    oov_slots = int(overrides.pop("oov_slots", "0"))
    glove_path = overrides.pop("glove", None)
    csv_path = overrides.pop("csv", None)
    if csv_path is not None:
        # Bulk mode: --csv=split.csv --img_dir=images [--out=preds.jsonl]
        if len(args) != 1:
            raise SystemExit(__doc__)
        img_dir = overrides.pop("img_dir", ".")
        out_path = overrides.pop("out", "predictions.jsonl")
        bs = int(overrides.pop("batch_size", "32"))
        # --grouped=false forces the flat per-pair path (default groups
        # multi-phrase images through one backbone pass each).
        grouped = overrides.pop("grouped", "true").lower() in ("1", "true", "yes")
        g = Grounder.from_checkpoint(
            args[0], vocab_path, batch_size=bs, quantize=quantize,
            cfg_overrides=overrides or None,
            oov_slots=oov_slots, glove_path=glove_path,
        )
        n = batch_predict(g, csv_path, img_dir, out_path, grouped=grouped)
        print(f"wrote {n} predictions → {out_path}")
        return
    if len(args) != 3:
        raise SystemExit(__doc__)
    ckpt_dir, image, query = args
    # cfg base = the checkpoint's own cfg.json sidecar; --key=val patches it.
    g = Grounder.from_checkpoint(
        ckpt_dir, vocab_path, batch_size=1, quantize=quantize,
        cfg_overrides=overrides or None,
        oov_slots=oov_slots, glove_path=glove_path,
    )
    (res,) = g.ground([image], [query])
    x1, y1, x2, y2 = res["box_xyxy"]
    print(f"{x1:.1f} {y1:.1f} {x2:.1f} {y2:.1f}  score={res['score']:.4f}")


if __name__ == "__main__":
    main()

"""Typed config system — JSON defaults + CLI/dict overrides.

Capability parity with the reference's ``code/extended_config.py`` +
``configs/cfg.json`` (yacs CfgNode; SURVEY.md §2 item 2), rebuilt as a
frozen dataclass so a Config can be closed over by jitted code and hashed
for compilation caching. Reference hyperparameter key names are preserved
(``ds_to_use``, ``mdl_to_use``, ``bs``, ``lr``, ``resize_img``, ``ratios``,
``scales``, ``lamb_reg``, ``use_focal``, ``use_softmax``, ``use_multi``,
``use_same_atb``, ``matching_threshold``, ``acc_iou_threshold``, …) so
reference experiment commands translate one-to-one.

TPU-specific additions: ``compute_dtype`` (bfloat16 compute), ``use_pallas``
(Pallas vs pure-jnp kernel selection), ``mesh_shape``/``data_axis`` for the
sharding mesh, ``donate`` for buffer donation in the train step.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

# 2^(1/3), 2^(2/3): RetinaNet octave scales, matching the reference cfg.json.
_DEFAULT_SCALES = (1.0, 1.2599210498948732, 1.5874010519681994)
_DEFAULT_RATIOS = (0.5, 1.0, 2.0)


@dataclasses.dataclass(frozen=True)
class Config:
    # --- experiment / dataset (reference keys) ---
    uid: str = "zsg_tpu"
    ds_to_use: str = "refclef"  # refclef | flickr30k | flickr_split0 | flickr_split1 | vg_split
    mdl_to_use: str = "retina"  # retina (ResNet50+FPN) | ssd_vgg
    data_dir: str = "data"
    test_split: str = "test"     # eval CSV stem: test | testA | testB … (refer toolkit sub-splits)
    bs: int = 16
    nw: int = 4                  # data-loading worker threads
    epochs: int = 10
    lr: float = 1e-4
    resize_img: tuple[int, int] = (300, 300)
    # --- query encoder ---
    emb_dim: int = 300
    glove_path: str = ""         # GloVe/word2vec txt → embedding init
    # Which splits feed the word dict. "train" mirrors the reference's
    # train-query word dict (SURVEY §2 item 3). "all" additionally ids
    # val/test words — the paper's zero-shot mechanism: unseen-split
    # words get GloVe-initialized rows that training provably never
    # touches (Adam's update is exactly 0 on zero-grad rows), so they
    # keep their semantics instead of collapsing onto <unk>.
    vocab_splits: str = "train"  # train | all
    lstm_dim: int = 256          # per-direction hidden; BiLSTM output = 512
    max_qlen: int = 50           # static pad length for queries
    vocab_size: int = 0          # 0 = derive from dataset vocab at build time
    # --- anchors / head ---
    ratios: tuple[float, ...] = _DEFAULT_RATIOS
    scales: tuple[float, ...] = _DEFAULT_SCALES
    matching_threshold: float = 0.5
    neg_threshold: float = 0.4
    acc_iou_threshold: float = 0.5
    use_same_atb: bool = True    # shared prediction head across scales
    fpn_ch: int = 256
    head_ch: int = 256
    # ssd_vgg mode: feed the head the backbone's NATIVE per-scale channels
    # (512/1024/512/256/256/256 — the reference head interface, so reference
    # SSD checkpoints map 1:1; heads become per-scale since their first conv
    # shapes differ). True inserts 1×1 projections to fpn_ch first — one
    # shared compiled head pipeline, but checkpoint-incompatible with the
    # reference's SSD head (round-1 behavior, kept as a perf option).
    ssd_uniform_proj: bool = False
    # --- loss (reference variants) ---
    lamb_reg: float = 1.0
    use_focal: bool = True
    use_softmax: bool = False
    use_multi: bool = True       # multi-positive matching (vs best-anchor only)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # --- training runtime ---
    opt_to_use: str = "adam"
    weight_decay: float = 0.0
    grad_clip: float = 0.0       # 0 = off
    # Gradient accumulation: split each global batch into this many
    # sequential microbatches inside the jitted step (lax.scan) and sum
    # unnormalized loss partials, so activation memory scales with
    # bs/grad_accum while grads stay EXACTLY the full-batch grads (the
    # num_pos normalizer depends only on annotations — each microbatch's
    # contribution is rescaled by its clamped global positive count and
    # the sum is divided by the total). BatchNorm is the one exception:
    # batch moments are per-microbatch (same caveat as torch accumulation)
    # — the BN-free SSD path is bit-exact end to end. bs must be divisible
    # by grad_accum (× mesh size when distributed).
    grad_accum: int = 1
    # Grouped multi-query training (beyond-reference; VERDICT r3 #4):
    # >1 groups the loader by IMAGE — each batch element is one image
    # with `queries_per_img` phrases (qvec (bs, Q, T), annot (bs, Q, 4)).
    # The backbone (the FLOP bulk) runs once per IMAGE and the fusion
    # head broadcasts per (image, phrase) — identical math to repeating
    # each image Q times in a flat batch (grads equality-tested), at
    # ~1/Q of the backbone cost. Flickr30k Entities averages ~5 phrases
    # per image (serve.py:34), making this a ~3-4x real-data training
    # throughput lever. `bs` counts IMAGES in grouped mode (bs·Q pairs
    # per step). Images with fewer phrases wrap-repeat their own
    # phrases. Validation/testing group too (same backbone saving);
    # wrap-repeated pairs are masked out of the metrics (pair_valid),
    # so eval numbers equal the flat per-pair loader's exactly.
    # Wrap-repeated pairs are ALSO masked out of the training loss via
    # the same pair_valid mask (r5): each real (image, phrase) pair
    # weighs exactly once per epoch, matching the reference's flat
    # sampler — no double-weighting for images with n % Q != 0 phrases.
    queries_per_img: int = 1
    # Re-draw the phrase→unit grouping every epoch (r5; VERDICT r4 weak
    # #3a): each epoch permutes every image's phrase list (deterministic
    # in (seed, epoch) — identical on all hosts, resume-safe) before
    # chunking into Q-sized units, so phrase co-occurrence within a unit
    # is not frozen at construction the way a static grouping would be
    # (the reference's flat sampler re-shuffles pairs independently every
    # epoch). Unit COUNT is permutation-invariant, so epoch length and
    # mid-epoch resume indices are unaffected. Applies to the train
    # split only (eval grouping stays static — deterministic metrics).
    # False keeps construction-order grouping (the equality-test mode).
    grouped_reseed: bool = True
    # Exponential moving average of params (beyond-reference; standard
    # detection-serving practice): >0 maintains ema = d·ema + (1-d)·params
    # inside the jitted step, with the TF-detection warmup schedule
    # d_t = min(ema_decay, (1+t)/(10+t)) so early steps aren't anchored to
    # the random init. validate()/testing() and saved checkpoints then
    # evaluate/serve the EMA weights (best-checkpoint selection included);
    # the raw params keep training unaffected. 0 = off (reference
    # behavior). BN running stats are already running averages and are
    # shared, not separately EMA'd.
    ema_decay: float = 0.0
    use_reduce_lr_plateau: bool = False
    plateau_factor: float = 0.1
    plateau_patience: int = 2
    # Step-granular LR schedules (beyond-reference: the reference's only
    # scheduler is epoch-granular ReduceLROnPlateau, SURVEY.md §2 item
    # 10). The scale is computed INSIDE the jitted step from
    # ``TrainState.step`` (parallel/train_step.py::lr_schedule_scale), so
    # resume is exact (step is checkpointed), nothing retraces, and it
    # composes multiplicatively with the plateau ``lr_scale``.
    lr_schedule: str = "const"  # const | cosine | linear
    warmup_steps: int = 0       # linear ramp (s+1)/warmup over the first steps
    # cosine/linear horizon in optimizer steps; 0 → the Learner fills in
    # epochs × batches-per-epoch at construction time.
    lr_decay_steps: int = 0
    lr_min_frac: float = 0.0    # LR floor at the horizon, as a fraction of cfg.lr
    seed: int = 0
    resume: bool = False
    resume_path: str = ""
    load_normally: bool = True   # strict load (False → partial/warm-start)
    only_val: bool = False
    only_test: bool = False
    log_every: int = 20
    ckpt_every_epochs: int = 1
    # Preemption-safe MID-EPOCH checkpointing (beyond-reference; TPU
    # fleets are preemptible): >0 saves every N optimizer steps inside
    # the epoch (host-async, overlapped with training) with the position
    # recorded, and resume continues from that exact batch — the
    # deterministic (seed, epoch) loader order makes the resumed run
    # equal the uninterrupted one (bit-grade on the BN-free SSD path;
    # tests/test_train.py::test_midepoch_resume_exact). 0 = epoch-end
    # checkpoints only (reference semantics).
    ckpt_every_steps: int = 0
    tmp_path: str = "tmp"
    # --- TPU-native knobs ---
    compute_dtype: str = "bfloat16"   # activations/conv compute; params+loss fp32
    use_pallas: bool = True           # Pallas kernels on TPU; jnp fallback elsewhere
    # Per-level NHWC loss/decode (zero-relayout hot path). False falls back
    # to the reference-shaped flat (B, ΣHWA) path (with Pallas fused loss
    # when use_pallas). Semantics are equality-tested between the two.
    use_level_path: bool = True
    # Ship uint8 images host→device (4× less transfer + host work) and
    # normalize in the first fused device op. False = host-side fp32
    # normalize (reference behavior). Numerics identical (fp32 normalize
    # either way; tested).
    normalize_on_device: bool = True
    # Cache decoded+resized images as a uint8 memmap next to the CSVs;
    # epochs after the first read at memory bandwidth (single-core hosts
    # are otherwise decode-bound).
    use_packed_cache: bool = False
    do_dist: bool = True              # shard batch over the data mesh axis
    mesh_shape: tuple[int, ...] = (-1,)  # -1 = all available devices, 1-D data mesh
    data_axis: str = "data"
    # Spatial partitioning (beyond-reference; DDP cannot do this): >1
    # builds a 2-D (data, spatial) mesh and shards the image HEIGHT over
    # `mesh_spatial` chips. Lets the 600² config train/serve with a
    # per-chip batch smaller than one sample's activations would
    # otherwise allow, and scales batch-1 latency over chips. Selects
    # the jnp loss paths (Pallas custom calls can't be auto-partitioned).
    # Eval/serving is GSPMD-partitioned (jit + in_shardings) and exact
    # for both backbones. TRAINING implementation per spatial_mode below.
    mesh_spatial: int = 1
    spatial_axis: str = "spatial"
    # Spatial TRAINING implementation:
    #   "auto"  — retina: "halo"; ssd_vgg: "gspmd" (each's measured-exact
    #             path);
    #   "halo"  — shard_map with explicit ppermute halo exchanges and one
    #             all_to_all reshard (gather height / split batch) at the
    #             first non-dividing stage; bypasses the jax-0.9 GSPMD
    #             grad miscompile on ResNet+FPN (parallel/halo.py).
    #             Retina-only.
    #   "gspmd" — jit + in_shardings auto-partitioning; exact for
    #             ssd_vgg, raises for retina (the measured miscompile —
    #             tools/check_spatial_gspmd.py).
    spatial_mode: str = "auto"
    prefetch_depth: int = 2
    remat_backbone: bool = False      # jax.checkpoint over backbone stages
    # Scoped-VMEM budget passed to the TPU compiler for every jitted
    # step (xla_tpu_scoped_vmem_limit_kib), 0 = compiler default. The
    # ONLY way to carry TPU flags in this environment is PJRT
    # compiler_options (XLA_FLAGS is rejected by the local client).
    # Default 24576 after four chip-measured wins and no regression:
    # train 300² B=128 +1.7%, bf16 serving +3.8%, int8 serving +4.0%,
    # 600² B=32 serving +4.6% (BASELINE.md round-3 sweeps,
    # tools/sweep_compile_flags.py). 40960 regresses. Ignored off-TPU.
    tpu_vmem_kib: int = 24576
    # Pack all pyramid levels into one zero-separated canvas and run the
    # shared head ONCE per conv layer (5× fewer dispatches, ~1.2× padding
    # FLOPs). Exact reparameterization — see models/canvas.py; only takes
    # effect with a shared same-channel head (retina, or SSD uniform proj).
    head_canvas: bool = False
    # Space-to-depth stem (exact conv7×7/s2 reparam; even image sizes only).
    # Changes the stem's param tree (conv1_kernel vs conv1/kernel) — pick
    # per experiment; the torch converter handles both (spd_stem arg).
    spd_stem: bool = False
    # Mirror the JSONL epoch rows to TensorBoard scalars (tensorboardX,
    # rank-0 only; silently off if the package is absent).
    use_tensorboard: bool = False
    # BatchNorm batch-variance formulation (training mode only; inference
    # uses running stats in all modes):
    #   "exact":   E[(x-μ)²], torch semantics — two passes, ~9% train-step
    #              cost (933 vs 991 qps @B=128, v5e);
    #   "fast":    flax default E[x²]-E[x]² — one pass, but cancellation
    #              puts 4-18% relative error into training-mode BN
    #              GRADIENTS through ResNet-50 (breaks trajectory parity,
    #              tests/test_convert_full.py);
    #   "shifted": one-pass shifted moments E[(x-c)²]-(E[x]-c)² with
    #              c = stop_gradient(running mean) — algebraically equal
    #              to exact, well-conditioned when c≈μ (always true when
    #              training from converted pretrained stats; from-scratch
    #              runs recover within ~20 steps as the EMA warms). See
    #              models/norm.py. Measured 1016 qps @B=128 — faster than
    #              even "fast" — the recommended production setting when
    #              training from pretrained backbones.
    bn_variance: str = "exact"
    # int8 serving quantization (inference-only; training untouched):
    #   "off" — bf16 serving (default); "calib" — fp forward that records
    #   per-conv activation |max| into the 'quant' collection; "int8" —
    #   per-tensor-activation × per-out-channel-weight int8 convs with
    #   int32 accumulation (backbone+FPN+head). v5e int8 convs measure
    #   1.45× bf16 (BASELINE.md). Calibrate before serving int8 —
    #   Grounder(quantize=True) does both. See models/quant.py.
    quant_mode: str = "off"
    # Quantize the fusion head too ("int8" mode). Activation scales are
    # keyed per input shape, so the shared head calibrates one scale PER
    # PYRAMID LEVEL — with a single shared scale head-quant collapsed
    # trained-model Acc to ~0.00; with per-level scales it matches bf16
    # within noise (0.297 vs 0.301 measured). False falls back to
    # backbone+FPN-only int8 (+14%). See BASELINE.md int8 section.
    quant_head: bool = True
    # Mesh axis for cross-device sync-BatchNorm ("" = per-shard stats).
    # Set automatically by the Learner when training over a mesh; makes
    # sharded training bit-equal to the same global batch on one chip.
    bn_sync_axis: str = ""

    # ------------------------------------------------------------------
    def __post_init__(self) -> None:
        # Fail BEFORE expensive setup: a bad enum value otherwise only
        # surfaces when its consumer first traces — minutes into a real
        # TPU run for lr_schedule (ADVICE r3 #3).
        _enums = {
            "lr_schedule": ("const", "cosine", "linear"),
            "spatial_mode": ("auto", "halo", "gspmd"),
            "vocab_splits": ("train", "all"),
            "mdl_to_use": ("retina", "ssd_vgg"),
            "bn_variance": ("exact", "fast", "shifted", "shifted16"),
        }
        for key, allowed in _enums.items():
            if getattr(self, key) not in allowed:
                raise ValueError(
                    f"{key}={getattr(self, key)!r} must be one of {allowed}"
                )
        for key in ("grad_accum", "queries_per_img", "mesh_spatial"):
            if int(getattr(self, key)) < 1:
                raise ValueError(f"{key} must be >= 1, got {getattr(self, key)}")

    @property
    def num_anchors(self) -> int:
        return len(self.ratios) * len(self.scales)

    @property
    def lang_dim(self) -> int:
        return 2 * self.lstm_dim

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **_coerce(self, kw))

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def dumps(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=list)


# Aliases so reference-style CLI flags keep working (reference key-map helper
# `update_from_dict(cfg, dct, key_maps)` — SURVEY.md §2 item 2).
KEY_MAPS = {
    "batch_size": "bs",
    "num_workers": "nw",
    "num_epochs": "epochs",
    "match_thr": "matching_threshold",
    "neg_thr": "neg_threshold",
}


def _coerce(cfg: Config, overrides: dict[str, Any]) -> dict[str, Any]:
    """Map aliases and coerce CLI string values to the field's type."""
    fields = {f.name: f for f in dataclasses.fields(Config)}
    out: dict[str, Any] = {}
    for key, val in overrides.items():
        key = KEY_MAPS.get(key, key)
        if key not in fields:
            raise KeyError(f"unknown config key: {key!r}")
        cur = getattr(cfg, key)
        if isinstance(val, str):
            if isinstance(cur, bool):
                val = val.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                val = int(val)
            elif isinstance(cur, float):
                val = float(val)
            elif isinstance(cur, tuple):
                parsed = json.loads(val)
                val = tuple(parsed)
        elif isinstance(val, list):
            val = tuple(val)
        out[key] = val
    return out


def get_default_cfg(config_path: str | Path | None = None) -> Config:
    """Defaults, optionally overlaid with a JSON file (configs/cfg.json)."""
    cfg = Config()
    if config_path is None:
        default = Path(__file__).resolve().parent.parent / "configs" / "cfg.json"
        config_path = default if default.exists() else None
    if config_path is not None:
        with open(config_path) as f:
            # "_comment"-style keys document preset files (JSON has no
            # comments); anything starting with "_" is not a config field.
            loaded = {k: v for k, v in json.load(f).items()
                      if not k.startswith("_")}
            cfg = cfg.replace(**loaded)
    return cfg


def update_from_dict(cfg: Config, overrides: dict[str, Any]) -> Config:
    """Reference-API-compatible override merge (aliases + type coercion)."""
    return cfg.replace(**overrides)

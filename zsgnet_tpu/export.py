"""AOT serving export — checkpoint → one portable StableHLO artifact.

The reference serves only from a live torch process with the full model
code importable (SURVEY.md §2.13 — no export/deployment story).
Production TPU serving wants the opposite: a self-contained artifact a
fleet can load without model definitions, checkpoint restores, or even
flax installed. ``jax.export`` gives exactly that — the whole serving
function (uint8 preprocessing + backbone + fusion + head + top-anchor
decode) is lowered ONCE per target platform and serialized as StableHLO
with the trained weights baked in as constants.

Artifact directory layout::

    serving_fn.stablehlo   jax.export payload (weights baked in)
    export.json            cfg dict + batch size + platforms + version
    vocab.json             query tokenizer (same format as ckpt sidecar)

``ExportedGrounder.load(dir)`` then serves with the same pre/post
processing as the live ``Grounder`` (shared helpers in ``predict.py``),
so the two paths produce byte-identical batches — equality is tested in
``tests/test_export.py``.

Notes:
- ``compiler_options`` (``cfg.tpu_vmem_kib``) do NOT travel inside the
  artifact: StableHLO is pre-compile, and ``jax.export`` rejects jits
  carrying compiler options. ``ExportedGrounder`` re-applies them at
  load time instead (its outer jit wraps the deserialized module), so
  artifact serving keeps the tuned scoped-VMEM schedule.
- int8 artifacts require the Grounder to be calibrated BEFORE export
  (the 'quant' scales become baked constants — serving never
  recalibrates, which is what a frozen deployment wants).

CLI:
    python -m zsgnet_tpu.export <ckpt_dir> <out_dir> [--batch_size=8]
        [--platforms=tpu,cpu] [--quantize=true] [--key=val ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from zsgnet_tpu.config import Config
from zsgnet_tpu.data.vocab import Vocab
from zsgnet_tpu.predict import Grounder, chunk_results, prep_chunk

_ARTIFACT_VERSION = 1


def export_serving(
    grounder: Grounder, out_dir: str | Path, platforms: tuple[str, ...] = ("tpu",)
) -> Path:
    """Serialize ``grounder``'s jitted serving function with weights baked in.

    Returns the artifact directory. ``platforms`` lowers one module per
    target ("tpu", "cpu", "cuda") — a ("tpu", "cpu") artifact runs on
    either; the dev-box CPU path is also how tests cover this without a
    chip.
    """
    from jax import export as jex

    if grounder.quantize and "quant" not in grounder.variables:
        raise ValueError(
            "int8 Grounder is uncalibrated — call .calibrate() (or .ground() "
            "once on representative data) before export; the activation "
            "scales are baked into the artifact"
        )
    cfg, bs = grounder.cfg, grounder.bs
    h, w = cfg.resize_img
    variables = jax.device_get(grounder.variables)  # host copy → constants
    infer = grounder._infer_fn  # raw (unjitted) — see Grounder.__init__

    # Weights close over the traced function and serialize as constants.
    # A fresh options-free jit: StableHLO cannot represent the tuned
    # compiler_options that grounder._infer carries on TPU.
    fn = jax.jit(lambda img, qvec, qlens: infer(variables, img, qvec, qlens))
    args = (
        jax.ShapeDtypeStruct((bs, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((bs, cfg.max_qlen), jnp.int32),
        jax.ShapeDtypeStruct((bs,), jnp.int32),
    )
    exported = jex.export(fn, platforms=platforms)(*args)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "serving_fn.stablehlo").write_bytes(exported.serialize())
    (out / "export.json").write_text(
        json.dumps(
            {
                "version": _ARTIFACT_VERSION,
                "cfg": cfg.to_dict(),
                "batch_size": bs,
                "platforms": list(platforms),
                "quantized": bool(grounder.quantize),
            },
            indent=2,
            default=list,
        )
    )
    grounder.vocab.save(out / "vocab.json")
    return out


class ExportedGrounder:
    """Serve from an exported artifact — no model code, no checkpoint.

    Same ``ground(images, queries)`` surface as the live ``Grounder``;
    preprocessing and box decode share ``predict.prep_chunk`` /
    ``predict.chunk_results``, so results match the exporting Grounder
    exactly (tests/test_export.py asserts equality).
    """

    def __init__(self, exported, cfg: Config, vocab: Vocab, batch_size: int):
        from zsgnet_tpu.utils.compile import compiler_options_for

        self.cfg, self.vocab, self.bs = cfg, vocab, batch_size
        # Re-jit the deserialized call so repeat batches hit the
        # executable cache (and pick the current default device). The
        # tuned compiler options could not travel inside the StableHLO
        # payload (see export_serving), but they CAN be re-applied at
        # this outer jit — the compile request wraps the deserialized
        # module, so artifact serving gets the same scoped-VMEM schedule
        # as the live Grounder (+3.8–4.6% on chip, BASELINE.md).
        self._call = jax.jit(
            exported.call, compiler_options=compiler_options_for(cfg)
        )

    @classmethod
    def load(cls, artifact_dir: str | Path) -> "ExportedGrounder":
        from jax import export as jex

        d = Path(artifact_dir)
        meta = json.loads((d / "export.json").read_text())
        if meta["version"] != _ARTIFACT_VERSION:
            raise ValueError(f"unsupported artifact version {meta['version']}")
        exported = jex.deserialize((d / "serving_fn.stablehlo").read_bytes())
        cfg = Config().replace(**meta["cfg"])
        vocab = Vocab.load(d / "vocab.json")
        return cls(exported, cfg, vocab, meta["batch_size"])

    def ground(self, images: list, queries: list) -> list[dict]:
        if len(images) != len(queries):
            raise ValueError("images and queries must pair up")
        out: list[dict] = []
        for start in range(0, len(images), self.bs):
            imgs, qvec, qlens, sizes, k = prep_chunk(
                self.cfg, self.vocab, self.bs,
                images[start : start + self.bs], queries[start : start + self.bs],
            )
            boxes, scores = self._call(
                jnp.asarray(imgs), jnp.asarray(qvec), jnp.asarray(qlens)
            )
            out.extend(chunk_results(boxes, scores, sizes, k))
        return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    overrides = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    if len(args) != 2:
        raise SystemExit(__doc__)
    ckpt_dir, out_dir = args
    bs = int(overrides.pop("batch_size", "8"))
    platforms = tuple(overrides.pop("platforms", "tpu").split(","))
    quantize = overrides.pop("quantize", "false").lower() in ("1", "true", "yes")
    vocab_path = overrides.pop("vocab", None)
    g = Grounder.from_checkpoint(
        ckpt_dir, vocab_path, batch_size=bs, quantize=quantize,
        cfg_overrides=overrides or None,
    )
    if g.quantize and "quant" not in g.variables:
        raise SystemExit(
            "--quantize export needs calibration data; serve one batch via "
            "Grounder.ground()/calibrate() programmatically, then export_serving()"
        )
    path = export_serving(g, out_dir, platforms=platforms)
    n = (path / "serving_fn.stablehlo").stat().st_size
    print(f"exported {platforms} serving artifact → {path} ({n/1e6:.1f} MB)")


if __name__ == "__main__":
    main()

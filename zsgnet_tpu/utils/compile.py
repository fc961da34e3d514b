"""PJRT compiler options shared by the train and serving jits.

``XLA_FLAGS`` cannot tune the TPU compiler in this environment — the
local client is a CPU build that rejects TPU flag names and the compile
happens on a remote server — but PJRT ``compiler_options`` ship with the
compile request and reach the TPU compiler (server-verified; see
``tools/sweep_compile_flags.py``). Off-TPU the options would fail the
CPU compiler, so they are gated out.
"""

from __future__ import annotations

import jax

from zsgnet_tpu.config import Config


def compiler_options_for(cfg: Config) -> dict[str, str] | None:
    """``cfg.tpu_vmem_kib`` → ``xla_tpu_scoped_vmem_limit_kib`` (TPU only).

    Chip-measured at 24576 KiB on the 300² B=128 retina configs
    (BASELINE.md round-3 sweeps): train step 126.5 → 124.4 ms (+1.7%),
    bf16 serving 28.9 → 27.9 ms (+3.8%); 40960 regresses both.
    """
    if cfg.tpu_vmem_kib and jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": str(cfg.tpu_vmem_kib)}
    return None

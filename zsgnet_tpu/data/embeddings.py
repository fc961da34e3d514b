"""Pretrained word-embedding initialization (GloVe/word2vec text format).

The reference's ``emb_dim=300`` embedding is initialized from GloVe
vectors (SURVEY.md §2 item 7 context). This loads the standard text
format (``word v1 v2 ... vD`` per line), builds the (V, D) table for a
:class:`zsgnet_tpu.data.vocab.Vocab` (normal(0, 0.6·std) init for OOV
words, zeros for PAD), and swaps it into a params pytree.

Usage: set ``cfg.glove_path``; the Learner applies it after init.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from zsgnet_tpu.data.vocab import PAD_ID, Vocab


def load_embedding_table(
    path: str | Path, vocab: Vocab, emb_dim: int, seed: int = 0
) -> tuple[np.ndarray, int]:
    """→ ((V, emb_dim) float32 table, #vocab words found in the file)."""
    wanted = vocab.word_to_id
    table = None
    found = 0
    hit = np.zeros(len(vocab), dtype=bool)
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < emb_dim + 1:
                continue  # header line (word2vec) or malformed row
            word = parts[0]
            idx = wanted.get(word)
            if idx is None:
                continue
            vec = np.asarray(parts[1 : emb_dim + 1], dtype=np.float32)
            if table is None:
                table = np.zeros((len(vocab), emb_dim), np.float32)
            table[idx] = vec
            hit[idx] = True
            found += 1
    rng = np.random.default_rng(seed)
    if table is None:
        table = np.zeros((len(vocab), emb_dim), np.float32)
    scale = float(table[hit].std()) * 0.6 if found else 0.1
    for i in range(len(vocab)):
        if not hit[i] and i != PAD_ID:
            table[i] = rng.normal(0, scale, emb_dim).astype(np.float32)
    table[PAD_ID] = 0.0
    return table, found


def set_embedding_param(params: Any, table: Any) -> Any:
    """Replace the ``query_enc/embed/embedding`` leaf (path-copied; works
    on dict or FrozenDict trees). The ONE place that knows the embedding
    leaf's path — ``apply_embedding_init`` and the Grounder's OOV-slot
    writes both go through it."""
    new = dict(params)
    new_qe = dict(new["query_enc"])
    new_embed = dict(new_qe["embed"])
    new_embed["embedding"] = table
    new_qe["embed"] = new_embed
    new["query_enc"] = new_qe
    return new


def apply_embedding_init(params: Any, table: np.ndarray) -> Any:
    """Return params with query_enc/embed/embedding replaced by ``table``."""
    import jax.numpy as jnp

    emb = params["query_enc"]["embed"]["embedding"]
    if emb.shape != table.shape:
        raise ValueError(f"embedding shape {emb.shape} != table {table.shape}")
    return set_embedding_param(params, jnp.asarray(table))

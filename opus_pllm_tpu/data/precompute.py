"""Offline ESM-embedding precompute (scripts #26 equivalents).

Counterparts of multi_modality_model/scripts/generate_esm_embedding.py
(instruction JSON -> jsonl with an `input_embed` per item, memoized by
sequence, skipping > 4000 aa) and generate_esm_for_each_seq.py (dedup
seq -> embedding JSON map). TPU-first: sequences are length-bucketed and
batched so the 33-layer encoder runs full MXU tiles instead of the
reference's one-sequence-at-a-time loop.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ESM2Config
from ..models import esm2
from ..core.util import round_up

MAX_PRECOMPUTE_LEN = 4000


def embed_sequences(params, cfg: ESM2Config, seqs: Iterable[str], *,
                    batch_size: int = 16, len_bucket: int = 128,
                    max_len: int = MAX_PRECOMPUTE_LEN,
                    impl: str = "auto") -> Dict[str, np.ndarray]:
    """Dedup + length-bucket + batch-encode -> {sequence: (E,) fp32}."""
    uniq = [s for s in dict.fromkeys(seqs) if len(s) <= max_len]
    uniq.sort(key=len)
    fn = jax.jit(lambda p, t: esm2.pooled_embedding(p, cfg, t, impl=impl),
                 static_argnames=())
    out: Dict[str, np.ndarray] = {}
    for s in range(0, len(uniq), batch_size):
        chunk = uniq[s:s + batch_size]
        pad_to = round_up(max(len(c) for c in chunk) + 2, len_bucket)
        toks, _ = esm2.tokenize(chunk, max_len=pad_to)
        emb = np.asarray(fn(params, jnp.asarray(toks)))
        for seq, e in zip(chunk, emb):
            out[seq] = e
    return out


def precompute_instruction_embeddings(params, cfg: ESM2Config,
                                      json_path: str, out_jsonl: str,
                                      **kw) -> int:
    """instruction JSON -> jsonl lines with `input_embed` per item."""
    with open(json_path) as f:
        items = [d for d in json.load(f) if d.get("input")]
    table = embed_sequences(params, cfg, (d["input"] for d in items), **kw)
    n = 0
    with open(out_jsonl, "w") as f:
        for d in items:
            emb = table.get(d["input"])
            if emb is None:      # > max_len aa, skipped like the reference
                continue
            f.write(json.dumps({**d, "input_embed": emb.tolist()}) + "\n")
            n += 1
    return n


def precompute_sequence_map(params, cfg: ESM2Config, json_path: str,
                            out_json: str, **kw) -> int:
    """instruction JSON -> {sequence: embedding} dedup map."""
    with open(json_path) as f:
        items = [d for d in json.load(f) if d.get("input")]
    table = embed_sequences(params, cfg, (d["input"] for d in items), **kw)
    with open(out_json, "w") as f:
        json.dump({k: v.tolist() for k, v in table.items()}, f)
    return len(table)


def precompute_cstp_pairs(esm_params, esm_cfg: ESM2Config, llm_params,
                          llm_cfg, tokenizer, uniprot_pickle: str,
                          out_pickle: str, *, batch_size: int = 8,
                          max_text_len: int = 4096, len_bucket: int = 128,
                          mask_pad: bool = False) -> int:
    """UniProtQA pickle -> [(seq_embedding, text_embedding)] vec pickle.

    The offline stage for stage-(a) training: ESM pooled embeddings paired
    with causal-LM text embeddings (TextEmbeddingExtractor semantics,
    cstp_v3/modelling.py:79-134) over the UniProt caption template.
    """
    import pickle

    import jax

    from ..models import text_encoder
    from .datasets import UniProtQADataset

    ds = UniProtQADataset(uniprot_pickle)
    seq_table = embed_sequences(esm_params, esm_cfg,
                                (p["sequence"] for p in ds.pairs),
                                batch_size=batch_size, len_bucket=len_bucket)
    text_fn = jax.jit(lambda p, ids, m: text_encoder.text_embeddings(
        p, llm_cfg, ids, m, mask_pad=mask_pad))
    out = []
    for s in range(0, len(ds), batch_size):
        chunk = ds.pairs[s:s + batch_size]
        enc = [tokenizer.encode(c["text"])[:max_text_len] for c in chunk]
        pad_to = round_up(max(len(e) for e in enc), len_bucket)
        ids = np.full((len(chunk), pad_to), tokenizer.pad_token_id, np.int32)
        mask = np.zeros((len(chunk), pad_to), bool)
        for i, e in enumerate(enc):
            ids[i, :len(e)] = e
            mask[i, :len(e)] = True
        te = np.asarray(text_fn(llm_params, jnp.asarray(ids),
                                jnp.asarray(mask)))
        for c, t in zip(chunk, te):
            out.append({"seq_embedding": seq_table[c["sequence"]],
                        "text_embedding": t})
    with open(out_pickle, "wb") as f:
        pickle.dump(out, f)
    return len(out)

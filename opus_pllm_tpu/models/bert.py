"""BERT encoder in JAX — backs BERTScore with BioBERT-large.

The reference computes BERTScore with `dmis-lab/biobert-large-cased-v1.1`
at num_layers=24 through torch (eval/metrics_computing_opi.py:57-70,
eval/metrics/bertscore). This is the torch-free equivalent: a post-LN BERT
encoder whose layer-24 hidden states feed the greedy cosine matching in
evals/metrics.bertscore_from_embeddings. Weights convert via
core/convert.bert_from_hf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import BertConfig
from . import layers
from .layers import attention, dense, dense_init, layer_norm, padding_mask


def init(key, cfg: BertConfig):
    dt = jnp.float32
    keys = jax.random.split(key, cfg.num_layers + 4)
    params = {
        "word_embeddings": layers.embed_init(keys[0], cfg.vocab_size,
                                             cfg.hidden_size, dt),
        "position_embeddings": layers.embed_init(
            keys[1], cfg.max_position_embeddings, cfg.hidden_size, dt),
        "token_type_embeddings": layers.embed_init(
            keys[2], cfg.type_vocab_size, cfg.hidden_size, dt),
        "embed_norm": {"scale": jnp.ones((cfg.hidden_size,), dt),
                       "bias": jnp.zeros((cfg.hidden_size,), dt)},
        "layers": [],
    }
    h = cfg.hidden_size
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i + 3], 6)
        params["layers"].append({
            "q_proj": dense_init(lk[0], h, h, dt, bias=True),
            "k_proj": dense_init(lk[1], h, h, dt, bias=True),
            "v_proj": dense_init(lk[2], h, h, dt, bias=True),
            "o_proj": dense_init(lk[3], h, h, dt, bias=True),
            "attn_norm": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
            "fc1": dense_init(lk[4], h, cfg.intermediate_size, dt, bias=True),
            "fc2": dense_init(lk[5], cfg.intermediate_size, h, dt, bias=True),
            "ffn_norm": {"scale": jnp.ones((h,), dt), "bias": jnp.zeros((h,), dt)},
        })
    return params


def encode(params, cfg: BertConfig, input_ids, attn_mask, token_type_ids=None,
           *, impl: str = "auto"):
    """(B, L) ids + bool mask -> final-layer hidden states (B, L, H).

    Post-LN transformer (original BERT): residual-add then LayerNorm after
    both attention and FFN.
    """
    b, l = input_ids.shape
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    pos = jnp.arange(l)[None, :]
    x = (layers.embed(params["word_embeddings"], input_ids)
         + layers.embed(params["position_embeddings"], pos)
         + layers.embed(params["token_type_embeddings"], token_type_ids))
    x = layer_norm(params["embed_norm"], x, eps=cfg.layer_norm_eps)
    mask4 = padding_mask(attn_mask)
    for p in params["layers"]:
        q = dense(p["q_proj"], x).reshape(b, l, nh, hd)
        k = dense(p["k_proj"], x).reshape(b, l, nh, hd)
        v = dense(p["v_proj"], x).reshape(b, l, nh, hd)
        a = attention(q, k, v, mask4, impl=impl).reshape(b, l, cfg.hidden_size)
        x = layer_norm(p["attn_norm"], x + dense(p["o_proj"], a),
                       eps=cfg.layer_norm_eps)
        f = dense(p["fc2"], layers.ACTIVATIONS["gelu"](dense(p["fc1"], x)))
        x = layer_norm(p["ffn_norm"], x + f, eps=cfg.layer_norm_eps)
    return x


def make_embed_fn(params, cfg: BertConfig, tokenizer, *, max_tokens: int = 500,
                  batch_size: int = 32, len_bucket: int = 64):
    """Closure for evals/metrics.compute_metrics(bert_embed_fn=...):
    texts -> (embeddings (B, L, H), mask (B, L)) with CLS/SEP masked out,
    inputs truncated to `max_tokens` WordPieces (metrics_computing_opi.py:12).
    Lengths round up to `len_bucket` so the 24-layer encoder compiles a
    bounded number of shapes per eval run."""
    import numpy as np

    from ..core.util import round_up

    jit_encode = jax.jit(lambda p, ids, m: encode(p, cfg, ids, m))

    def embed_texts(texts):
        encs = [tokenizer.encode(t, max_tokens=max_tokens) for t in texts]
        out_e, out_m = [], []
        for s in range(0, len(encs), batch_size):
            chunk = encs[s:s + batch_size]
            ln = round_up(max(len(e) for e in chunk), len_bucket)
            ids = np.full((len(chunk), ln), tokenizer.pad_id, np.int32)
            mask = np.zeros((len(chunk), ln), bool)
            content = np.zeros((len(chunk), ln), bool)
            for i, e in enumerate(chunk):
                ids[i, :len(e)] = e
                mask[i, :len(e)] = True
                content[i, 1:len(e) - 1] = True   # drop [CLS]/[SEP]
            emb = jit_encode(params, jnp.asarray(ids), jnp.asarray(mask))
            out_e.append(np.asarray(emb))
            out_m.append(content)
        ln = max(e.shape[1] for e in out_e)
        pe = np.zeros((len(encs), ln, out_e[0].shape[-1]), np.float32)
        pm = np.zeros((len(encs), ln), bool)
        row = 0
        for e, m in zip(out_e, out_m):
            pe[row:row + len(e), :e.shape[1]] = e
            pm[row:row + len(m), :m.shape[1]] = m
            row += len(e)
        return pe, pm

    return embed_texts

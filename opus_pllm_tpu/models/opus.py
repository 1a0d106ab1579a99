"""Opus multimodal model: ESM2 -> CSTP -> switch projector -> LLM.

The TPU-native counterpart of the reference's `OpusMetaModelForCauselLM`
pipeline (multi_modality_v1/model/opus_arch.py:94-309 and the per-family
wrappers opus_{llama,opt,qwen}.py): encode each protein sequence with the
frozen ESM2 encoder, map the pooled embedding through the CSTP adapter
(`encode_projector_embedding`, opus_arch.py:115-121), expand it to
`n_tokens` soft tokens with the switch projector (opus_arch.py:122-131),
splice those into the text embedding stream at the `<seq>` sentinels
(static-shape splicer instead of the reference's ragged Python loop), and
run the decoder.

Everything here is a pure function over one params pytree:

    {"esm": ..., "cstp": ... | absent, "switch": ..., "llm": ...}

so a single `jax.jit`/`pjit` covers the whole multimodal forward, and
sharding rules attach uniformly (parallel/partition.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..bridge import cstp as cstp_mod
from ..bridge import projector as switch_mod
from ..bridge.splice import Spliced, output_len, splice
from ..core.config import IGNORE_INDEX, OpusConfig
from . import decoder, esm2, text_encoder
from .layers import causal_mask


def init(key, cfg: OpusConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "esm": esm2.init(k1, cfg.esm),
        "switch": switch_mod.init(k3, cfg.switch),
        "llm": decoder.init(k4, cfg.llm),
    }
    if cfg.cstp is not None:
        params["cstp"] = cstp_mod.init(k2, cfg.cstp)
    return params


def encode_proteins(params, cfg: OpusConfig, esm_tokens=None, *,
                    pooled_emb=None, impl: str = "auto"):
    """(B, P, L_aa) int32 ESM tokens -> (B, P, n_tokens, H) soft tokens.

    Mirrors encode_seq2embedding -> encode_projector_embedding ->
    switch_projector_embedding (opus_arch.py:103-131). When the model runs
    without a CSTP adapter, the raw pooled ESM embedding feeds the switch
    projector directly (identity-projector fallback, opus_arch.py:71-80).

    `pooled_emb` (B, P, E) skips the ESM tower — the precomputed-embedding
    training path (scripts/generate_esm_embedding.py data; the encoders stay
    out of the stage-(c)/(d) graph like the reference's offline pipeline).
    """
    if pooled_emb is not None:
        b, p, _ = pooled_emb.shape
        emb = pooled_emb.reshape(b * p, -1).astype(jnp.float32)
    else:
        b, p, l = esm_tokens.shape
        flat = esm_tokens.reshape(b * p, l)
        emb = esm2.pooled_embedding(params["esm"], cfg.esm, flat, impl=impl)
    if "cstp" in params:
        emb = cstp_mod.protein_forward(params["cstp"], emb)
    soft = switch_mod.apply(params["switch"], cfg.switch, emb,
                            out_dtype=cfg.llm.jnp_dtype)
    return soft.reshape(b, p, cfg.switch.n_tokens, cfg.llm.hidden_size)


def splice_prompt(params, cfg: OpusConfig, input_ids, attn_mask, esm_tokens,
                  labels=None, *, left_pad: bool, pooled_emb=None,
                  impl: str = "auto") -> Spliced:
    """Tokenized prompt (with SEQ_TOKEN_INDEX sentinels) -> decoder inputs."""
    prot = encode_proteins(params, cfg, esm_tokens, pooled_emb=pooled_emb,
                           impl=impl)
    text = decoder.embed_tokens(params["llm"], jnp.maximum(input_ids, 0))
    return splice(input_ids, attn_mask, text, prot, labels,
                  n_tokens=cfg.switch.n_tokens, left_pad=left_pad)


@functools.partial(jax.jit, static_argnames=("cfg",))
def protein_cstp_embeddings(params, cfg: OpusConfig, esm_tokens):
    """(B, L) ESM tokens -> (B, P) shared-space embeddings: pooled ESM
    (excl. BOS/EOS) through the CSTP protein projection — the stage-(a)
    retrieval representation (CSTPBase.protein_forward,
    cstp_v3/modelling.py:396-400). Without a CSTP adapter, the raw pooled
    ESM embedding (the identity-projector fallback, opus_arch.py:71-80)."""
    emb = esm2.pooled_embedding(params["esm"], cfg.esm, esm_tokens)
    if "cstp" in params:
        emb = cstp_mod.protein_forward(params["cstp"], emb)
    return emb


@functools.partial(jax.jit, static_argnames=("cfg", "mask_pad"))
def text_cstp_embeddings(params, cfg: OpusConfig, input_ids, attn_mask, *,
                         mask_pad: bool = True):
    """(B, L) right-padded ids + mask -> (B, P) shared-space embeddings:
    the causal LM's (first + last hidden) mean through the CSTP text
    projection (TextEmbeddingExtractor + CSTPBase.forward text half,
    cstp_v3/modelling.py:105-134, :378-394). Only valid when the serving
    LLM's hidden size equals cstp.text_dim — callers must check."""
    emb = text_encoder.text_embeddings(params["llm"], cfg.llm, input_ids,
                                       attn_mask, mask_pad=mask_pad)
    return cstp_mod.text_forward(params["cstp"], emb)


@functools.partial(jax.jit, static_argnames=("cfg",))
def splice_prompt_left(params, cfg: OpusConfig, input_ids, attn_mask,
                       esm_tokens) -> Spliced:
    """Jitted left-pad splice shared by the serving front and the engine
    eval runners: ONE process-wide compile cache per (bucket, esm_bucket)
    shape instead of a separately-cached jit wrapper per call site."""
    return splice_prompt(params, cfg, input_ids, attn_mask, esm_tokens,
                         left_pad=True)


def forward(params, cfg: OpusConfig, input_ids, attn_mask, esm_tokens=None,
            labels=None, *, lora=None, lora_scale: float = 1.0,
            left_pad: bool = False, pooled_emb=None, remat: bool = False,
            scan_mode: str = "xs", return_hidden: bool = False,
            impl: str = "auto") -> Tuple[jnp.ndarray, Spliced]:
    """Full multimodal forward -> (logits (B, L_out, V), spliced inputs).

    return_hidden=True returns final-norm'ed hidden states instead of
    logits (feed to next_token_loss_hidden for chunked-CE training)."""
    sp = splice_prompt(params, cfg, input_ids, attn_mask, esm_tokens, labels,
                       left_pad=left_pad, pooled_emb=pooled_emb, impl=impl)
    mask4 = causal_mask(sp.mask)
    logits, _ = decoder.forward(
        params["llm"], cfg.llm, sp.embeds.astype(cfg.llm.jnp_dtype),
        sp.positions, mask4, lora=lora, lora_scale=lora_scale, remat=remat,
        scan_mode=scan_mode, return_hidden=return_hidden, impl=impl)
    return logits, sp


def next_token_loss(logits, labels, mask) -> jnp.ndarray:
    """Shifted next-token CE, ignoring IGNORE_INDEX (HF causal-LM semantics:
    the reference trains through super().forward(labels=...),
    opus_llama.py:60-90)."""
    lg = logits[:, :-1].astype(jnp.float32)
    tg = labels[:, 1:]
    valid = (tg != IGNORE_INDEX) & mask[:, 1:]
    tg_safe = jnp.maximum(tg, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, tg_safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def next_token_loss_hidden(llm_params, llm_cfg, hidden, labels, mask,
                           *, chunk: int = 64, shift: bool = True,
                           reduce: bool = True,
                           vary_axis=None) -> jnp.ndarray:
    """Same loss as next_token_loss, computed from final-norm'ed hidden
    states with the vocab projection applied per sequence chunk.

    The full path materializes (B, S, V) fp32 logits plus a log_softmax
    copy — ~2 GB each at B=4, S=512, V=128k — which is what pushes a
    single 16 GB chip over the edge when 8B int8 weights already occupy
    ~9.5 GB. Chunking bounds the live logits to (B, chunk, V); the
    jax.checkpoint'ed scan body recomputes each chunk's projection in the
    backward pass instead of saving it (decoder.head_logits), so training
    memory for the head is O(S/chunk smaller) at the cost of one extra
    head matmul in the backward.

    shift=False consumes PRE-shifted targets (labels[i] is position i's
    target) — the sequence-parallel path (train/sp.py) shifts globally
    before sharding, because a shard-boundary position's target lives in
    the next shard. reduce=False returns the (sum, count) partials instead
    of the mean, for callers that psum across shards first."""
    b, s, _ = hidden.shape
    if shift:
        hs, tg = hidden[:, :-1], labels[:, 1:]
        valid = (tg != IGNORE_INDEX) & mask[:, 1:]
    else:
        hs, tg = hidden, labels
        valid = (tg != IGNORE_INDEX) & mask
    sl = hs.shape[1]
    n = -(-sl // chunk)
    pad = n * chunk - sl
    if pad:
        hs = jnp.pad(hs, ((0, 0), (0, pad), (0, 0)))
        tg = jnp.pad(tg, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    hs = hs.reshape(b, n, chunk, hs.shape[-1]).transpose(1, 0, 2, 3)
    tg = jnp.maximum(tg, 0).reshape(b, n, chunk).transpose(1, 0, 2)
    valid = valid.reshape(b, n, chunk).transpose(1, 0, 2)

    def body(carry, xs):
        hc, tc, vc = xs
        logp = jax.nn.log_softmax(head_logits_fp32(hc), axis=-1)
        nll = -jnp.take_along_axis(logp, tc[..., None], axis=-1)[..., 0]
        return (carry[0] + jnp.sum(jnp.where(vc, nll, 0.0)),
                carry[1] + jnp.sum(vc)), None

    def head_logits_fp32(hc):
        return decoder.head_logits(llm_params, llm_cfg, hc).astype(
            jnp.float32)

    init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))
    if vary_axis is not None:
        # inside shard_map the freshly-created accumulators are unvarying
        # constants while the scanned partial sums vary over the mesh
        # axis; mark them varying so the scan carry type-checks
        from ..core.util import pvary
        init = tuple(pvary(x, vary_axis) for x in init)
    (tot, cnt), _ = jax.lax.scan(jax.checkpoint(body), init, (hs, tg, valid))
    if not reduce:
        return tot, cnt
    return tot / jnp.maximum(cnt, 1)

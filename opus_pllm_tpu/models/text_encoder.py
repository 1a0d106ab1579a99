"""Text-embedding extraction for CSTP stage-(a) data generation.

Counterpart of `TextEmbeddingExtractor` (cstp_v3/modelling.py:79-134): the
text embedding of a caption is the mean over token positions of (first
hidden state + last hidden state) of a causal LM. The reference pads every
batch to tokenizer_max_length=4096 and averages over ALL positions —
including padding (modelling.py:105-124); `mask_pad=True` opts into the
masked mean instead, and is the recommended setting for new training runs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import DecoderConfig
from . import decoder
from .layers import causal_mask


def text_embeddings(params, cfg: DecoderConfig, input_ids, attn_mask, *,
                    mask_pad: bool = False, impl: str = "auto"):
    """(B, L) right-padded ids + bool mask -> (B, H) fp32 embeddings."""
    x0 = decoder.embed_tokens(params, input_ids)
    positions = decoder.positions_from_mask(attn_mask)
    if cfg.family == "opt":
        # HF hidden_states[0] for OPT includes the learned positions
        first = x0 + decoder.embed(
            params["embed_positions"], positions + decoder.OPT_POS_OFFSET)
    else:
        first = x0
    mask4 = causal_mask(attn_mask)
    last, _ = decoder.forward(params, cfg, x0, positions, mask4, impl=impl,
                              return_hidden=True)
    s = (first.astype(jnp.float32) + last.astype(jnp.float32))
    if mask_pad:
        m = attn_mask[..., None].astype(jnp.float32)
        return jnp.sum(s * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.mean(s, axis=1)

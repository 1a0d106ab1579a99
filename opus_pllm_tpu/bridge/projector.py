"""Switch (modality refinement) projector — stage (c).

Maps one CSTP protein embedding to `n_tokens` LLM soft tokens:
Linear(input -> hidden*n_tokens) [+ (depth-1) x (GELU, Linear)] then reshape
to (B, n_tokens, hidden). Mirrors protein_mlp/builder.py:11-25 ('linear' /
'mlpNx_gelu') and the reshape at opus_arch.py:128-131.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import SwitchProjectorConfig
from ..models.layers import ACTIVATIONS, dense, dense_init


def init(key, cfg: SwitchProjectorConfig):
    depth = cfg.mlp_depth
    keys = jax.random.split(key, depth)
    layers = [dense_init(keys[0], cfg.input_dim, cfg.output_dim,
                         jnp.float32, bias=True)]
    for i in range(1, depth):
        layers.append(dense_init(keys[i], cfg.output_dim, cfg.output_dim,
                                 jnp.float32, bias=True))
    return {"layers": layers}


def apply(params, cfg: SwitchProjectorConfig, x, out_dtype=None):
    """(B, input_dim) -> (B, n_tokens, llm_hidden). Compute fp32."""
    h = x.astype(jnp.float32)
    h = dense(params["layers"][0], h)
    for p in params["layers"][1:]:
        h = dense(p, ACTIVATIONS["gelu"](h))
    h = h.reshape(h.shape[0], cfg.n_tokens, cfg.llm_hidden_size)
    return h.astype(out_dtype) if out_dtype is not None else h

"""Alternative CSTP adapter architectures.

The reference defines (but comments out of the active path) a family of
richer adapters in cstp_v3/modelling.py:136-273: a per-vector multi-head
cross-attention encoder stack (`ProteinAdapterLayer_v2` of `EncoderLayer`s
over `MultiHeadCrossAttention`), a residual text projection with ratio
alpha (`TextProjectionLayer`), and a ReLU+dropout protein adapter
(`ProteinAdapterLayer`). They are first-class here so CSTP ablations can
switch architectures by config rather than by editing the model file.

Note the reference's cross attention operates on POOLED vectors: each
(B, D) embedding splits into `num_heads` chunks that attend across the
batch-of-one "sequence" of head slots (modelling.py:150-170); we keep that
per-vector semantic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.layers import dense, dense_init, layer_norm


# --- multi-head cross attention over pooled vectors -------------------------

def cross_attention_init(key, d_model: int):
    ks = jax.random.split(key, 4)
    return {"w_q": dense_init(ks[0], d_model, d_model, bias=True),
            "w_k": dense_init(ks[1], d_model, d_model, bias=True),
            "w_v": dense_init(ks[2], d_model, d_model, bias=True),
            "fc": dense_init(ks[3], d_model, d_model, bias=True)}


def cross_attention(params, q_vec, k_vec, v_vec, num_heads: int):
    """(B, D) vectors; heads attend over the head axis of the key vector."""
    b, d = q_vec.shape
    dk = d // num_heads
    q = dense(params["w_q"], q_vec).reshape(b, num_heads, dk)
    k = dense(params["w_k"], k_vec).reshape(b, num_heads, dk)
    v = dense(params["w_v"], v_vec).reshape(b, num_heads, dk)
    scores = jnp.einsum("bhd,bgd->bhg", q, k) / jnp.sqrt(float(dk))
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhg,bgd->bhd", attn, v).reshape(b, d)
    return dense(params["fc"], out)


# --- encoder layer + stack ---------------------------------------------------

def encoder_layer_init(key, d_model: int):
    k1, k2 = jax.random.split(key)
    return {"mha": cross_attention_init(k1, d_model),
            "norm1": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
            "norm2": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
            "ff": dense_init(k2, d_model, d_model, bias=True)}


def encoder_layer(params, seq_vec, text_vec, num_heads: int):
    a = cross_attention(params["mha"], seq_vec, text_vec, text_vec, num_heads)
    out1 = layer_norm(params["norm1"], seq_vec + a)
    return layer_norm(params["norm2"], out1 + dense(params["ff"], out1))


def adapter_stack_init(key, d_model: int, n_layers: int = 3):
    return {"layers": [encoder_layer_init(k, d_model)
                       for k in jax.random.split(key, n_layers)]}


def adapter_stack(params, seq_vec, text_vec, num_heads: int = 4):
    for p in params["layers"]:
        seq_vec = encoder_layer(p, seq_vec, text_vec, num_heads)
    return seq_vec


# --- residual text projection (ratio alpha) ---------------------------------

def residual_text_projection_init(key, feature_dim: int, intermediate_dim: int):
    k1, k2 = jax.random.split(key)
    return {"linear1": dense_init(k1, feature_dim, intermediate_dim, bias=True),
            "linear2": dense_init(k2, intermediate_dim, feature_dim, bias=True)}


def residual_text_projection(params, f, alpha: float = 0.8):
    """f' = alpha * W2 relu(W1 f) + (1 - alpha) * f."""
    av = dense(params["linear2"], jax.nn.relu(dense(params["linear1"], f)))
    return alpha * av + (1.0 - alpha) * f


# --- relu+dropout protein adapter --------------------------------------------

def relu_adapter_init(key, input_dim: int, output_dim: int):
    return {"linear": dense_init(key, input_dim, output_dim, bias=True)}


def relu_adapter(params, x, *, dropout_rate: float = 0.1,
                 rng: Optional[jax.Array] = None):
    x = jax.nn.relu(dense(params["linear"], x))
    if rng is not None and dropout_rate > 0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    return x

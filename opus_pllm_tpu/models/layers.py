"""Shared transformer building blocks as pure functions over param pytrees.

Design notes (TPU-first):
- Params are plain nested dicts of jnp arrays: transparent for pjit sharding
  rules and for PyTorch checkpoint conversion.
- Matmuls accumulate in fp32 (`preferred_element_type`); softmax runs fp32.
- Attention is a single swappable call site: the XLA einsum path here, the
  Pallas flash-attention kernel in `kernels/` behind the same signature.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large finite mask value (matches reference masked_fill -1e9)


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32,
               bias: bool = False, scale: Optional[float] = None):
    """Kaiming-uniform style linear init (same family torch.nn.Linear uses)."""
    bound = scale if scale is not None else 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    p = {"kernel": jax.random.uniform(kw, (in_dim, out_dim), dtype=jnp.float32,
                                      minval=-bound, maxval=bound).astype(dtype)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype=jnp.float32,
                                       minval=-bound, maxval=bound).astype(dtype)
    return p


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32, std: float = 0.02):
    return {"embedding": (jax.random.normal(key, (vocab, dim)) * std).astype(dtype)}


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def dense(params, x):
    if "kernel_q" in params:   # int8 weight-only quantized linear
        from ..kernels.quant import qdense
        return qdense(params, x)
    if "kernel_p" in params:   # int4 grouped-quantized linear
        from ..kernels.quant4 import qdense4
        return qdense4(params, x)
    # fp32 activations get true-fp32 matmuls (JAX's "default" precision may
    # run fp32 dots at ~bf16 precision); bf16 stays on the fast MXU path.
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32,
                precision=prec)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def embed(params, ids):
    return jnp.take(params["embedding"], ids, axis=0)


def lora_dense(params, lora, x, scaling: float = 1.0):
    """dense() plus a low-rank LoRA delta: y = xW + scaling * (xA)B.

    `lora` is None (no adapter) or {"A": (in, r), "B": (r, out)}. The delta
    runs in fp32 like the base matmul; with B zero-initialized this is an
    exact no-op at step 0 (PEFT convention).
    """
    y = dense(params, x)
    if lora is None:
        return y
    return (y.astype(jnp.float32)
            + lora_delta(lora, x, scaling)).astype(y.dtype)


def lora_delta(lora, x, scaling: float = 1.0):
    """fp32 LoRA delta scaling * (xA)B alone — for fused-projection blocks
    that apply per-projection adapters onto slices of one fused matmul.

    A 3-d A/B ((B, in, r) / (B, r, out)) carries one adapter PER ROW of
    x (B, L, in) — the multi-LoRA serving path, where each slot of the
    decode batch runs its own adapter gathered from a bank."""
    A, Bm = lora["A"], lora["B"]
    if A.ndim == 3:
        a = jnp.einsum("blh,bhr->blr", x, A.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        d = jnp.einsum("blr,bro->blo", a, Bm.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return scaling * d
    a = jnp.dot(x, A.astype(x.dtype), preferred_element_type=jnp.float32)
    d = jnp.dot(a, Bm.astype(x.dtype), preferred_element_type=jnp.float32)
    return scaling * d


def rms_norm(params, x, eps: float = 1e-5):
    h = x.astype(jnp.float32)
    var = jnp.mean(h * h, axis=-1, keepdims=True)
    h = h * jax.lax.rsqrt(var + eps)
    return (h * params["scale"].astype(jnp.float32)).astype(x.dtype)


def layer_norm(params, x, eps: float = 1e-5):
    # One-pass statistics (E[x^2] - mu^2, fp32): mean and mean-of-squares
    # reduce in a single fused read of x instead of the two chained passes
    # of the definitional form — the encode profile showed fp32 LN reduces
    # at 15% of ESM2-650M device time (BENCH_NOTES.md round 2). fp32
    # accumulation keeps bf16 inputs exact to ~1e-7 of the two-pass form.
    # Known regime limit: when |mean| >> std the E[x^2]-mu^2 subtraction
    # cancels catastrophically (var clamps to 0, silently). Transformer
    # activations are zero-centered enough that parity tests pass at 1e-6;
    # if tolerances ever tighten, switch to the shifted one-pass form
    # E[(x-c)^2] with c = a first-row estimate (still a single read of x).
    h = x.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    musq = jnp.mean(jnp.square(h), axis=-1, keepdims=True)
    var = jnp.maximum(musq - jnp.square(mu), 0.0)
    h = (h - mu) * jax.lax.rsqrt(var + eps)
    return (h * params["scale"].astype(jnp.float32)
            + params["bias"].astype(jnp.float32)).astype(x.dtype)


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": partial(jax.nn.gelu, approximate=False),  # erf gelu (torch default)
    "gelu_tanh": partial(jax.nn.gelu, approximate=True),
}


# ---------------------------------------------------------------------------
# Rotary position embeddings (GPT-NeoX half-split convention — used by both
# fair-esm ESM2 and Llama/Qwen)
# ---------------------------------------------------------------------------

def ntk_scaled_theta(theta: float, head_dim: int, context_len: int,
                     max_trained: int, alpha_floor: float = 1.0) -> float:
    """Dynamic NTK-aware RoPE base rescaling (the Qwen `use_dynamic_ntk`
    behavior): when the static context length exceeds the trained window,
    raise the rotary base so the lowest frequency spans the longer
    context without re-training:

        theta' = theta * s ** (d / (d - 2)),  s = context_len / max_trained

    Everything here is static (shapes), so under jit this folds to a
    compile-time constant — no data-dependent control flow."""
    if context_len <= max_trained:
        return theta
    scale = max(context_len / max_trained, alpha_floor)
    return theta * (scale ** (head_dim / (head_dim - 2)))


def rope_cos_sin(positions, head_dim: int, theta: float = 10000.0):
    """cos/sin tables for given integer positions, shape (*pos, head_dim)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (*pos, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """x: (B, S, H, D); cos/sin: (B, S, D) or (S, D)."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention (XLA reference path; Pallas flash kernel plugs in behind same API)
# ---------------------------------------------------------------------------

def attention(q, k, v, mask=None, *, impl: str = "auto"):
    """Multi-head (grouped-query) scaled dot-product attention.

    q: (B, Sq, Hq, D); k, v: (B, Skv, Hkv, D) with Hq % Hkv == 0.
    mask: bool (B, 1|Hq, Sq, Skv) — True = attend. Softmax in fp32.

    impl: "auto" uses the Pallas kernel only on shapes where it measures
    faster than XLA (kernels.flash_attention.supports); "flash" forces it
    on any TPU-lowerable shape (e.g. the d=64-native tiles, for A/B runs);
    "xla" forces the reference path.
    """
    if impl == "ring":
        # sequence-parallel training path (parallel/ring.py): must run
        # inside shard_map over a "seq" axis, and `mask` is the 2-D
        # (B, S_loc) LOCAL kv-validity mask (causality is index-based in
        # the ring, matching causal_mask's tril)
        from ..parallel.ring import ring_attention
        return ring_attention(q, k, v, mask, causal=True)
    if impl == "sp_decode":
        # sequence-sharded DECODE (infer/sp_engine.py): q replicated,
        # k/v = this device's cache shard, `mask` the 2-D (B, S_loc) local
        # validity (a slot valid on exactly one device); partial softmax
        # merges across shards with the log-sum-exp rule
        from ..parallel.ring import sharded_decode_attention
        return sharded_decode_attention(q, k, v, mask)
    if impl == "flash" and jax.default_backend() == "tpu":
        from ..kernels.flash_attention import flash_attention
        return flash_attention(q, k, v, mask)
    if impl == "auto" and _flash_ok(q, k, mask):
        from ..kernels.flash_attention import flash_attention
        return flash_attention(q, k, v, mask)
    return attention_xla(q, k, v, mask)


def _flash_ok(q, k, mask) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # flash kernel needs seq lens divisible by its block size and D>=64
    from ..kernels.flash_attention import supports
    return supports(q, k, mask)


def attention_xla(q, k, v, mask=None):
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    q_ = (q * (1.0 / math.sqrt(d))).reshape(b, sq, hkv, groups, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", q_, k,
                        preferred_element_type=jnp.float32, precision=prec)
    if mask is not None:
        m = mask[:, :, None] if mask.shape[1] == 1 else \
            mask.reshape(b, hkv, groups, sq, -1)
        logits = jnp.where(m, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)  # fp32
    out = jnp.einsum("bhgqk,bkhd->bqhgd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def causal_mask(attn_mask, sq: Optional[int] = None):
    """Combine a padding mask (B, Skv) with causality into (B, 1, Sq, Skv)."""
    b, skv = attn_mask.shape
    sq = skv if sq is None else sq
    causal = jnp.tril(jnp.ones((skv, skv), dtype=bool))[-sq:]  # (Sq, Skv)
    return attn_mask[:, None, None, :] & causal[None, None]


def padding_mask(attn_mask, sq: Optional[int] = None):
    """Bidirectional padding-only mask (B, 1, Sq, Skv)."""
    b, skv = attn_mask.shape
    sq = skv if sq is None else sq
    return jnp.broadcast_to(attn_mask[:, None, None, :], (b, 1, sq, skv))

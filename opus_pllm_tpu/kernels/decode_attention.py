"""Pallas TPU fused decode attention over the int8-quantized KV cache.

Replaces the reference's xformers+bitsandbytes pairing at the decode step
(README.md:20-24; builder.py:44-57) in the regime where KV reads co-dominate
the roofline (batch >= 32 / long contexts, BENCH_NOTES.md): the XLA path
dequantizes the whole cache to bf16 in HBM every token (read int8 + write
bf16 + read bf16 = ~2.5x the bf16 cache traffic); this kernel reads the
int8 values + fp32 scales straight into VMEM and applies the scales to the
logits/weights instead of the tensors:

    logits[g, t] = (q[g, :] . k_int8[t, :]) * k_scale[t] * 1/sqrt(d)
    out[g, :]    = sum_t (softmax(logits)[g, t] * v_scale[t]) * v_int8[t, :]

so the dequantized cache never exists anywhere, and HBM sees 0.5x the
bf16-cache bytes.

Grid design (round-3 lesson): ONE program per (batch row, KV head), whole
per-head cache row in VMEM, single-pass softmax over the full (G, Skv)
logit row. The first cut blocked Skv into 256-token chunks with an
online-softmax sweep (flash-style) — at B=32, cap=1152 that is 40960 grid
programs per token-step across 32 layers, and per-program overhead made it
3x SLOWER than the XLA dequant path (373 tok/s). A (G, Skv) fp32 logit row
is at most a few hundred KB, so flash-style blocking buys nothing here;
the coarse grid cuts program count 5x and removes all scratch-state
traffic. GQA: the G = Hq/Hkv query heads of one KV head are the sublane
rows of a single (G, D) tile, so each int8 row is read ONCE.

The head-major cache layout ((B, H, S, D), models/decoder.init_cache)
makes each program's (Skv, D) int8 block one contiguous DMA — the
value-native (B, S, H, D) layout produced 128-byte strided rows, which
also lost to dequantize-then-attend end to end.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30

CAP_ALIGN = 256            # engine rounds cache capacity to the flash block
MAX_VMEM_CAP = 8192        # at d=128: per-program K/V int8 bytes = 2*cap*d
                           # (8k*128*2 = 2 MB) + their bf16 casts + fp32
                           # logits + double-buffered input windows: well
                           # under VMEM. The budget scales with head_dim, so
                           # supports() divides this cap by d/128.


def supports(q, k_leaf, mask4) -> bool:
    """Dispatchable shapes: TPU backend, one query token, int8 cache dict
    leaves, 128-multiple head dim, aligned capacity small enough that a
    whole per-head cache row fits VMEM, a broadcast (B, 1, 1, Skv) mask,
    and G = Hq/Hkv <= 8 (one sublane tile)."""
    if jax.default_backend() != "tpu":
        return False
    if not isinstance(k_leaf, dict):
        return False
    b, sq, hq, d = q.shape
    hkv, cap = k_leaf["q"].shape[1], k_leaf["q"].shape[2]
    if sq != 1 or d % 128 != 0 or cap % CAP_ALIGN != 0:
        return False
    if cap > MAX_VMEM_CAP // (d // 128):   # working set grows with d
        return False
    if hq % hkv != 0 or hq // hkv > 8:
        return False
    if mask4 is None or mask4.shape[1] != 1 or mask4.shape[2] != 1:
        return False
    return True


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref,
            *, scale: float):
    q = q_ref[0, 0]                                       # (G, D) bf16
    k8 = k_ref[0, 0].astype(q.dtype)                      # (CAP, D)
    # fp32 logits; per-token k scales fold into the logit columns
    s = jax.lax.dot_general(q, k8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (G, CAP)
    s = s * (ks_ref[0] * scale)                           # * (1, CAP)
    s = jnp.where(m_ref[0] != 0, s, NEG_LARGE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # per-token v scales fold into the softmax weights; the int8 v block
    # feeds the MXU directly (ints to 127 are exact in bf16)
    pw = (p * vs_ref[0]).astype(jnp.bfloat16)
    v8 = v_ref[0, 0].astype(jnp.bfloat16)                 # (CAP, D)
    o = jax.lax.dot_general(pw, v8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@jax.jit
def decode_attention_int8(q, k_leaf, v_leaf, mask4):
    """q: (B, 1, Hq, D); k_leaf/v_leaf: head-major int8 cache leaves
    {"q": (B, Hkv, Skv, D) int8, "s": (B, Hkv, Skv, 1) fp32};
    mask4: (B, 1, 1, Skv) bool. Returns (B, 1, Hq, D) in q.dtype."""
    b, _, hq, d = q.shape
    hkv, cap = k_leaf["q"].shape[1], k_leaf["q"].shape[2]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)

    # (B, Hkv, G, D): the G query heads of one KV head share a tile.
    # Scale planes reshape (free) to (B*Hkv, 1, Skv): the singleton middle
    # dim spans its full axis, satisfying Mosaic's last-two-block-dims rule.
    qt = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    ks = k_leaf["s"].reshape(b * hkv, 1, cap)
    vs = v_leaf["s"].reshape(b * hkv, 1, cap)
    mask2 = mask4[:, 0, :, :].astype(jnp.int8)            # (B, 1, Skv)

    grid = (b, hkv)
    in_specs = [
        pl.BlockSpec((1, 1, g, d), lambda ib, ih: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, cap, d), lambda ib, ih: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, cap),
                     lambda ib, ih, _h=hkv: (ib * _h + ih, 0, 0)),
        pl.BlockSpec((1, 1, cap, d), lambda ib, ih: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, cap),
                     lambda ib, ih, _h=hkv: (ib * _h + ih, 0, 0)),
        pl.BlockSpec((1, 1, cap), lambda ib, ih: (ib, 0, 0)),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, d), lambda ib, ih: (ib, ih, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * cap * d,
            bytes_accessed=(k_leaf["q"].size * 2 + ks.size * 8 + q.size * 2),
            transcendentals=b * hq * cap,
        ),
    )(qt, k_leaf["q"], ks, v_leaf["q"], vs, mask2)
    return out.reshape(b, 1, hq, d)


MAX_VMEM_CAP4 = 16384      # packed int4 halves the per-program cache bytes


def supports_int4(q, k_leaf, mask4) -> bool:
    """Same gates as supports(), for packed-int4 leaves ({"q4": (B, Hkv,
    Skv, D/2) int8, "s": ...}). Packed bytes are half the int8 bytes, so
    twice the capacity fits VMEM."""
    if jax.default_backend() != "tpu":
        return False
    if not (isinstance(k_leaf, dict) and "q4" in k_leaf):
        return False
    b, sq, hq, d = q.shape
    hkv, cap = k_leaf["q4"].shape[1], k_leaf["q4"].shape[2]
    if sq != 1 or d % 128 != 0 or cap % CAP_ALIGN != 0:
        return False
    if cap > MAX_VMEM_CAP4 // (d // 128):
        return False
    if hq % hkv != 0 or hq // hkv > 8:
        return False
    if mask4 is None or mask4.shape[1] != 1 or mask4.shape[2] != 1:
        return False
    return True


def _unpack4(p_ref):
    """Packed (CAP, D/2) byte block -> two bf16 (CAP, D/2) lane halves.

    4-bit magnitudes (|q| <= 7) are exact in bf16; the widened int32
    shift chain is the same irreducible VPU cost as kernels/quant4.py
    (v5e has no uint8 shift or uint8->bf16 cast), but here it runs on a
    packed stream that is only HALF the int8 kernel's cache bytes."""
    p = p_ref[0, 0].astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    return lo, hi


def _kernel4(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref,
             *, scale: float):
    q = q_ref[0, 0]                                       # (G, D) bf16
    h = q.shape[-1] // 2
    k_lo, k_hi = _unpack4(k_ref)                          # (CAP, D/2) x2
    # logits split over the two lane halves of the packed contraction dim:
    # byte column j holds (lo: d=j, hi: d=j+D/2), so q's matching halves
    # contract against them directly — no in-kernel concatenate on K
    s = (jax.lax.dot_general(q[:, :h], k_lo, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(q[:, h:], k_hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32))
    s = s * (ks_ref[0] * scale)                           # * (1, CAP)
    s = jnp.where(m_ref[0] != 0, s, NEG_LARGE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pw = (p * vs_ref[0]).astype(jnp.bfloat16)             # (G, CAP)
    v_lo, v_hi = _unpack4(v_ref)
    o_lo = jax.lax.dot_general(pw, v_lo, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_hi = jax.lax.dot_general(pw, v_hi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o = jnp.concatenate([o_lo, o_hi], axis=-1)            # (G, D) fp32
    o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@jax.jit
def decode_attention_int4(q, k_leaf, v_leaf, mask4):
    """q: (B, 1, Hq, D); k_leaf/v_leaf: head-major packed-int4 cache leaves
    {"q4": (B, Hkv, Skv, D/2) int8, "s": (B, Hkv, Skv, 1) fp32};
    mask4: (B, 1, 1, Skv) bool. Returns (B, 1, Hq, D) in q.dtype."""
    b, _, hq, d = q.shape
    hkv, cap = k_leaf["q4"].shape[1], k_leaf["q4"].shape[2]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)

    qt = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    ks = k_leaf["s"].reshape(b * hkv, 1, cap)
    vs = v_leaf["s"].reshape(b * hkv, 1, cap)
    mask2 = mask4[:, 0, :, :].astype(jnp.int8)            # (B, 1, Skv)

    grid = (b, hkv)
    in_specs = [
        pl.BlockSpec((1, 1, g, d), lambda ib, ih: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, cap, d // 2), lambda ib, ih: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, cap),
                     lambda ib, ih, _h=hkv: (ib * _h + ih, 0, 0)),
        pl.BlockSpec((1, 1, cap, d // 2), lambda ib, ih: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, cap),
                     lambda ib, ih, _h=hkv: (ib * _h + ih, 0, 0)),
        pl.BlockSpec((1, 1, cap), lambda ib, ih: (ib, 0, 0)),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel4, scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, d), lambda ib, ih: (ib, ih, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * cap * d,
            bytes_accessed=(k_leaf["q4"].size * 2 + ks.size * 8
                            + q.size * 2),
            transcendentals=b * hq * cap,
        ),
    )(qt, k_leaf["q4"], ks, v_leaf["q4"], vs, mask2)
    return out.reshape(b, 1, hq, d)


def decode_attention_int8_reference(q, k_leaf, v_leaf, mask4):
    """Pure-XLA reference (dequantize-then-attend) for CPU tests and
    numerics checks — the exact path the kernel replaces."""
    from ..models.decoder import _dequantize_kv
    from ..models.layers import attention_xla

    k = _dequantize_kv(k_leaf, q.dtype)
    v = _dequantize_kv(v_leaf, q.dtype)
    return attention_xla(q, k, v, mask4)

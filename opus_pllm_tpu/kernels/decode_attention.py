"""Pallas TPU fused decode attention over the int8-quantized KV cache.

Replaces the reference's xformers+bitsandbytes pairing at the decode step
(README.md:20-24; builder.py:44-57) in the one regime where KV reads
co-dominate the roofline (batch >= 32 / long contexts, BENCH_NOTES.md):
the previous path dequantized the whole cache to bf16 in HBM every token
(read int8 + write bf16 + read bf16 = ~2.5x the bf16 cache traffic), this
kernel reads the int8 values + fp32 scales straight into VMEM and applies
the scales to the logits/weights instead of the tensors:

    logits[g, t] = (q[g, :] . k_int8[t, :]) * k_scale[t] * 1/sqrt(d)
    out[g, :]    = sum_t (softmax(logits)[g, t] * v_scale[t]) * v_int8[t, :]

so the dequantized cache never exists anywhere, and HBM sees 0.5x the
bf16-cache bytes. One query token per row (Sq == 1): the online-softmax
sweep runs over KV blocks in the sequential last grid dimension with the
(m, l, acc) state in VMEM scratch, same layout discipline as
flash_attention.py. GQA: the G = Hq/Hkv query heads of one KV head are the
sublane rows of a single (G, D) tile, so each int8 block is read ONCE for
all its query heads.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30

BLOCK_K = 256      # int8 min tile is (32, 128); cap rounds to 256 upstream


def supports(q, k_leaf, mask4) -> bool:
    """Dispatchable shapes: TPU backend, one query token, int8 cache dict
    leaves, 128-multiple head dim, capacity divisible by the KV block, a
    broadcast (B, 1, 1, Skv) mask, and G = Hq/Hkv <= 8 (one sublane tile)."""
    if jax.default_backend() != "tpu":
        return False
    if not isinstance(k_leaf, dict):
        return False
    b, sq, hq, d = q.shape
    hkv, cap = k_leaf["q"].shape[1], k_leaf["q"].shape[2]
    if sq != 1 or d % 128 != 0 or cap % BLOCK_K != 0:
        return False
    if hq % hkv != 0 or hq // hkv > 8:
        return False
    if mask4 is None or mask4.shape[1] != 1 or mask4.shape[2] != 1:
        return False
    return True


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_ref, o_ref,
            m_s, l_s, acc_s, *, scale: float, g: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_LARGE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0, 0]                                       # (G, D) bf16
    k8 = k_ref[0, 0].astype(q.dtype)                      # (BK, D)
    # logits in fp32; per-token k scales fold into the logit columns
    s = jax.lax.dot_general(q, k8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (ks_ref[0] * scale)                           # (G, BK) * (1, BK)
    s = jnp.where(m_ref[0] != 0, s, NEG_LARGE)

    # scratch rows :g carry the live state (scratch sublane dim padded to 8)
    m_prev = m_s[:g, :1]
    l_prev = l_s[:g, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                                # (G, BK) fp32
    alpha = jnp.exp(m_prev - m_new)
    l_s[:g, :] = jnp.broadcast_to(alpha * l_prev
                                  + jnp.sum(p, axis=-1, keepdims=True),
                                  (g, l_s.shape[1]))
    # per-token v scales fold into the softmax weights; the int8 v block
    # feeds the MXU directly (ints to 127 are exact in bf16)
    pw = (p * vs_ref[0]).astype(jnp.bfloat16)
    v8 = v_ref[0, 0].astype(jnp.bfloat16)                 # (BK, D)
    acc_s[:g, :] = acc_s[:g, :] * alpha + jax.lax.dot_general(
        pw, v8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_s[:g, :] = jnp.broadcast_to(m_new, (g, m_s.shape[1]))

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0, 0] = (acc_s[:g, :]
                       / jnp.maximum(l_s[:g, :1], 1e-30)).astype(o_ref.dtype)


@jax.jit
def decode_attention_int8(q, k_leaf, v_leaf, mask4):
    """q: (B, 1, Hq, D); k_leaf/v_leaf: head-major int8 cache leaves
    {"q": (B, Hkv, Skv, D) int8, "s": (B, Hkv, Skv, 1) fp32};
    mask4: (B, 1, 1, Skv) bool. Returns (B, 1, Hq, D) in q.dtype."""
    b, _, hq, d = q.shape
    hkv, cap = k_leaf["q"].shape[1], k_leaf["q"].shape[2]
    g = hq // hkv
    scale = 1.0 / math.sqrt(d)

    # (B, Hkv, G, D): the G query heads of one KV head share a tile. The
    # head-major cache layout makes each (BK, D) int8 block a CONTIGUOUS
    # 32 KB DMA (the original (B, S, H, D) layout produced 128-byte
    # strided rows, which lost to dequantize-then-attend end to end).
    # Scale planes reshape (free) to (B*Hkv, 1, Skv): the singleton middle
    # dim spans its full axis, satisfying Mosaic's last-two-block-dims rule.
    qt = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    ks = k_leaf["s"].reshape(b * hkv, 1, cap)
    vs = v_leaf["s"].reshape(b * hkv, 1, cap)
    mask2 = mask4[:, 0, :, :].astype(jnp.int8)            # (B, 1, Skv)

    grid = (b, hkv, cap // BLOCK_K)
    in_specs = [
        pl.BlockSpec((1, 1, g, d), lambda ib, ih, ik: (ib, ih, 0, 0)),
        pl.BlockSpec((1, 1, BLOCK_K, d), lambda ib, ih, ik: (ib, ih, ik, 0)),
        pl.BlockSpec((1, 1, BLOCK_K),
                     lambda ib, ih, ik, _h=hkv: (ib * _h + ih, 0, ik)),
        pl.BlockSpec((1, 1, BLOCK_K, d), lambda ib, ih, ik: (ib, ih, ik, 0)),
        pl.BlockSpec((1, 1, BLOCK_K),
                     lambda ib, ih, ik, _h=hkv: (ib * _h + ih, 0, ik)),
        pl.BlockSpec((1, 1, BLOCK_K), lambda ib, ih, ik: (ib, 0, ik)),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, g=g),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, g, d),
                               lambda ib, ih, ik: (ib, ih, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),    # running max (rows :G)
            pltpu.VMEM((8, 128), jnp.float32),    # running denom
            pltpu.VMEM((8, d), jnp.float32),      # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * cap * d,
            bytes_accessed=(k_leaf["q"].size * 2 + ks.size * 8 + q.size * 2),
            transcendentals=b * hq * cap,
        ),
    )(qt, k_leaf["q"], ks, v_leaf["q"], vs, mask2)
    return out.reshape(b, 1, hq, d)


def decode_attention_int8_reference(q, k_leaf, v_leaf, mask4):
    """Pure-XLA reference (dequantize-then-attend) for CPU tests and
    numerics checks — the exact path the kernel replaces."""
    from ..models.decoder import _dequantize_kv
    from ..models.layers import attention_xla

    k = _dequantize_kv(k_leaf, q.dtype)
    v = _dequantize_kv(v_leaf, q.dtype)
    return attention_xla(q, k, v, mask4)

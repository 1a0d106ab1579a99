"""Pallas TPU flash attention (forward).

TPU-native replacement for the reference's xformers memory-efficient attention
(reference README.md:20-24 — xformers is the CUDA attention inside the HF
Llama/OPT/Qwen it wraps). Online-softmax blockwise attention: O(S) VMEM,
logits never materialized in HBM.

Layout: grid (B, Hq, nQ, nK); the last grid dim is sequential ("arbitrary"),
so the (m, l, acc) running-softmax state lives in VMEM scratch across the KV
sweep. GQA is handled in the index maps (KV head = q head // group size).

Masks: a bool mask (B, Sq, Skv) streams in block-by-block; `causal=True`
additionally lets whole KV blocks above the diagonal skip their matmuls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30  # exp(NEG_LARGE - m) == 0 in fp32

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
# d=64-native tiles: whole-row 512 blocks measured 1.43x over XLA attention
# on the ESM2-650M encode shape (B=128, H=20, S=512) — vs 0.7x for the old
# pad-to-128 path, which wasted half of every lane (BENCH_NOTES.md round 2)
D64_BLOCK_Q = 512
D64_BLOCK_K = 512


def _d64_native_ok(sq: int, skv: int, block_q: int, block_k: int) -> bool:
    return (block_q == DEFAULT_BLOCK_Q and block_k == DEFAULT_BLOCK_K
            and sq % D64_BLOCK_Q == 0 and skv % D64_BLOCK_K == 0)


def supports(q, k, mask) -> bool:
    """Shapes where the kernel BEATS XLA; `attention(impl="auto")` callers
    fall back to XLA otherwise. Auto-dispatch requires d % 128 == 0:
    at d=64 even the native 512-block tiles (1.43x over XLA in isolation)
    LOSE end to end — the (B,S,H,D)->(B,H,S,D) transposes around the
    opaque pallas_call cost more than the kernel saves (BENCH_NOTES.md
    round 2: encode 75 vs 104 seqs/s). Call flash_attention directly to
    force the d=64-native path."""
    b, sq, hq, d = q.shape
    skv = k.shape[1]
    if mask is not None and mask.shape[1] not in (1,):
        return False
    if d % 128 != 0:
        return False
    bq = min(DEFAULT_BLOCK_Q, sq)
    bk = min(DEFAULT_BLOCK_K, skv)
    if sq % bq != 0 or skv % bk != 0 or bq % 8 != 0 or bk % 128 != 0:
        return False
    return True


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, m_s, l_s, acc_s,
            *, scale: float, causal: bool, block_q: int, block_k: int):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_LARGE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    iq = pl.program_id(2)
    # Causal: skip KV blocks strictly above the diagonal.
    run = (iq * block_q + block_q - 1 >= ik * block_k) if causal else True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale          # (BQ, D)
        k = k_ref[0, 0].astype(jnp.float32)                  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (BQ, BK)
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_LARGE)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], s, NEG_LARGE)

        m_prev = m_s[:, :1]                                   # (BQ, 1)
        l_prev = l_s[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)                       # (BQ, 1)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
            p, v_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_s[...] = jnp.broadcast_to(m_new, m_s.shape)
        l_s[...] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_s[:, :1]
        o_ref[0, 0] = (acc_s[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if lse_ref is not None:
            # logsumexp of scaled+masked logits, consumed by the bwd kernels
            lse_ref[0, 0] = (m_s[...]
                             + jnp.log(jnp.maximum(l_s[...], 1e-30)))[:, :8]


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def flash_attention(q, k, v, mask=None, *, causal: bool = False,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K):
    """q: (B, Sq, Hq, D); k, v: (B, Skv, Hkv, D); mask: (B, 1, Sq, Skv) bool.

    Returns (B, Sq, Hq, D) in q.dtype. Softmax statistics in fp32.

    Differentiable: pallas_call has no autodiff rule, so a custom VJP runs
    the Pallas kernel forward and recomputes the backward with the XLA
    reference implementation (flash bwd kernel is a planned optimization —
    the recompute keeps training on TPU correct today).
    """

    return _flash_core(q, k, v, mask, causal, block_q, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, mask, causal, block_q, block_k):
    return _flash_impl(q, k, v, mask, causal, block_q, block_k)


def _flash_core_fwd(q, k, v, mask, causal, block_q, block_k):
    out, lse = _flash_impl(q, k, v, mask, causal, block_q, block_k,
                           want_lse=True)
    return out, (q, k, v, mask, out, lse)


def _flash_core_bwd(causal, block_q, block_k, res, g):
    q, k, v, mask, out, lse = res
    if _bwd_supported(q, k):
        from .flash_attention_bwd import flash_attention_bwd

        dq, dk, dv = flash_attention_bwd(
            q, k, v, mask, out, lse, g, causal=causal,
            block_q=block_q, block_k=block_k)
    else:   # XLA-recompute fallback (O(S^2) memory, always correct)
        from ..models.layers import attention_xla

        m = mask
        if causal:
            sq, skv = q.shape[1], k.shape[1]
            cmask = (jnp.arange(skv)[None, None, None, :]
                     <= jnp.arange(sq)[None, None, :, None])
            cmask = jnp.broadcast_to(cmask, (q.shape[0], 1, sq, skv))
            m = cmask if m is None else (m & cmask)
        _, vjp = jax.vjp(lambda a, b, c: attention_xla(a, b, c, m), q, k, v)
        dq, dk, dv = vjp(g)
    dmask = None if mask is None else \
        np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


def _bwd_supported(q, k) -> bool:
    # the Pallas bwd handles the same shapes as the fwd (incl. padded d=64)
    return q.shape[-1] % 128 == 0 or q.shape[-1] == 64


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _flash_impl(q, k, v, mask, causal: bool, block_q: int, block_k: int,
                want_lse: bool = False):
    b, sq, hq, d_orig = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    if mask is not None and mask.shape[1] != 1:
        # impl="flash" bypasses supports(); fail loudly instead of a
        # shape error deep inside the mask reshape
        raise ValueError(
            f"flash_attention takes a broadcast (B, 1, Sq, Skv) mask; got "
            f"head dim {mask.shape[1]} — use attention(impl='xla') for "
            f"per-head masks")
    groups = hq // hkv
    scale = 1.0 / math.sqrt(d_orig)
    d = d_orig
    if d == 64 and _d64_native_ok(sq, skv, block_q, block_k):
        # d=64-native path: keep the 64-wide lanes, use whole-row tiles
        bq, bk = min(D64_BLOCK_Q, sq), min(D64_BLOCK_K, skv)
    else:
        bq = min(block_q, sq)
        bk = min(block_k, skv)
        if d == 64:
            # pad head dim to the 128-lane tile; zero dims contribute
            # nothing to the q.k logits, extra output columns slice off below
            pad = [(0, 0)] * 3 + [(0, 64)]
            q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
            d = 128
    if sq % bq != 0 or skv % bk != 0:
        raise ValueError(
            f"flash_attention needs block-multiple sequence lengths: "
            f"sq={sq} % bq={bq}, skv={skv} % bk={bk} — pad the sequences or "
            f"pass block_q/block_k that divide them (grid floor-division "
            f"would silently leave trailing blocks uncomputed)")

    # (B, H, S, D) layout so blocks are (S, D) tiles per head
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, hq, sq // bq, skv // bk)
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda ib, ih, iq, ik: (ib, ih // groups, ik, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda ib, ih, iq, ik: (ib, ih // groups, ik, 0)),
    ]
    args = [qt, kt, vt]
    if mask is not None:
        m3 = mask.reshape(b, sq, skv)
        in_specs.append(pl.BlockSpec((1, bq, bk),
                                     lambda ib, ih, iq, ik: (ib, iq, ik)))
        args.append(m3)
        def kern(qr, kr, vr, mr, *rest, _wl=want_lse):
            if _wl:
                o, lse, m_s, l_s, a_s = rest
            else:
                (o, m_s, l_s, a_s), lse = rest, None
            _kernel(qr, kr, vr, mr, o, lse, m_s, l_s, a_s, scale=scale,
                    causal=causal, block_q=bq, block_k=bk)
    else:
        def kern(qr, kr, vr, *rest, _wl=want_lse):
            if _wl:
                o, lse, m_s, l_s, a_s = rest
            else:
                (o, m_s, l_s, a_s), lse = rest, None
            _kernel(qr, kr, vr, None, o, lse, m_s, l_s, a_s, scale=scale,
                    causal=causal, block_q=bq, block_k=bk)

    o_spec = pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0))
    o_shape = jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype)
    if want_lse:
        # stats layout (B, Hq, Sq, 8): last dim equals the overall dim so
        # the TPU (8, 128) tiling rule is satisfied at 8x (not 128x) memory
        out_specs = (o_spec, pl.BlockSpec(
            (1, 1, bq, 8), lambda ib, ih, iq, ik: (ib, ih, iq, 0)))
        out_shape = (o_shape,
                     jax.ShapeDtypeStruct((b, hq, sq, 8), jnp.float32))
    else:
        out_specs, out_shape = o_spec, o_shape

    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max m
            pltpu.VMEM((bq, 128), jnp.float32),   # running denom l
            pltpu.VMEM((bq, d), jnp.float32),     # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
    )(*args)
    out, lse = res if want_lse else (res, None)
    out = out.transpose(0, 2, 1, 3)
    out = out[..., :d_orig] if d != d_orig else out
    if want_lse:
        return out, lse[..., 0]        # (B, Hq, Sq)
    return out

"""Pallas TPU flash attention — backward kernels.

O(S)-memory attention gradients from the saved (out, lse) residuals:
logits are recomputed block-by-block, never materialized in HBM (the
XLA-recompute fallback in flash_attention.py materializes the full (Sq,
Skv) score matrix in the backward).

Math per (q-block i, k-block j), with s = scale * q k^T masked:
    p  = exp(s - lse_i)                       # softmax probs, exact
    dv_j += p^T do_i
    dp  = do_i v_j^T
    ds  = p * (dp - delta_i) * scale          # delta_i = rowsum(do_i * o_i)
    dk_j += ds^T q_i
    dq_i += ds k_j

Two kernels: dq sweeps K blocks sequentially per q-block; dkv sweeps Q
blocks sequentially per k-block. GQA: dk/dv are produced per q-head and
group-summed to KV heads in XLA afterwards.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -1e30


def _probs(q_blk, k_blk, lse_col, mask_blk, causal, iq, ik, bq, bk, scale):
    """Recomputed softmax probabilities for one tile.

    Masked entries are zeroed EXPLICITLY rather than via exp of a large
    negative: for a FULLY-masked query row, lse saturates to -1e30 in fp32
    (the log-l term is absorbed), exp(s - lse) = 1 per entry, and ~Skv-times
    inflated garbage would flow into dq/dk/dv. Zeroing defines the
    convention: fully-masked (padding) rows contribute ZERO gradient. Note
    the XLA reference instead yields "uniform-attention" gradients for such
    rows (an artifact of -1e9 masking); both are arbitrary because padding
    rows must be excluded from any loss — only this convention is also
    numerically stable.
    """
    s = jax.lax.dot_general(q_blk, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_col)
    if causal:
        rows = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        p = jnp.where(rows >= cols, p, 0.0)
    if mask_blk is not None:
        p = jnp.where(mask_blk, p, 0.0)
    return p


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
               dq_ref, acc, *, scale, causal, bq, bk):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    iq = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    run = (iq * bq + bq - 1 >= ik * bk) if causal else True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        m = mask_ref[0] if mask_ref is not None else None
        p = _probs(q, k, lse_ref[0, 0][:, :1], m, causal, iq, ik,
                   bq, bk, scale)                               # (BQ, BK)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
        acc[...] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _fin():
        dq_ref[0, 0] = acc[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale, causal, bq, bk):
    iq = pl.program_id(3)
    nq = pl.num_programs(3)
    ik = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = (iq * bq + bq - 1 >= ik * bk) if causal else True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        m = mask_ref[0] if mask_ref is not None else None
        p = _probs(q, k, lse_ref[0, 0][:, :1], m, causal, iq, ik,
                   bq, bk, scale)
        dv_acc[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (BK, D)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (BK, D)

    @pl.when(iq == nq - 1)
    def _fin():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def flash_attention_bwd(q, k, v, mask, out, lse, g, *, causal: bool,
                        block_q: int, block_k: int):
    """Gradients (dq, dk, dv) matching attention over the same mask.

    q (B,Sq,Hq,D); k,v (B,Skv,Hkv,D); out,g like q; lse (B,Hq,Sq) fp32.
    """
    b, sq, hq, d_orig = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    groups = hq // hkv
    bq = min(block_q, sq)
    bk = min(block_k, skv)
    if sq % bq != 0 or skv % bk != 0:
        raise ValueError(
            f"flash_attention_bwd needs block-multiple sequence lengths: "
            f"sq={sq} % bq={bq}, skv={skv} % bk={bk} — grid floor-division "
            f"would silently leave trailing gradient blocks uncomputed")
    scale = 1.0 / math.sqrt(d_orig)
    d = d_orig
    if d == 64:
        # mirror the forward's pad-to-128 trick: zero columns contribute
        # nothing to scores/delta and the extra gradient columns slice off
        pad = [(0, 0)] * 3 + [(0, 64)]
        q, k, v, out, g = (jnp.pad(t, pad) for t in (q, k, v, out, g))
        d = 128

    # delta_i = rowsum(do * o): one fused elementwise pass in XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                                   # (B, Sq, Hq)
    delta = delta.transpose(0, 2, 1)                           # (B, Hq, Sq)
    # (B, Hq, Sq, 8): satisfies the TPU (8, 128) block-tiling rule with 8x
    # (not 128x) stats memory
    lse_t = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))
    delta_t = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    gt = g.transpose(0, 2, 1, 3)
    m3 = mask.reshape(b, sq, skv) if mask is not None else None

    def specs(iq_map, ik_map):
        sp = [
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, i, j: (ib, ih, iq_map(i, j), 0)),
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, i, j: (ib, ih // groups, ik_map(i, j), 0)),
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, i, j: (ib, ih // groups, ik_map(i, j), 0)),
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, i, j: (ib, ih, iq_map(i, j), 0)),
            pl.BlockSpec((1, 1, bq, 8), lambda ib, ih, i, j: (ib, ih, iq_map(i, j), 0)),
            pl.BlockSpec((1, 1, bq, 8), lambda ib, ih, i, j: (ib, ih, iq_map(i, j), 0)),
        ]
        if m3 is not None:
            sp.append(pl.BlockSpec(
                (1, bq, bk), lambda ib, ih, i, j: (ib, iq_map(i, j), ik_map(i, j))))
        return sp

    args = [qt, kt, vt, gt, lse_t, delta_t] + ([m3] if m3 is not None else [])

    def wrap(kernel):
        if m3 is not None:
            return functools.partial(kernel, scale=scale, causal=causal,
                                     bq=bq, bk=bk)
        def no_mask(*refs, **kw):
            ins, rest = refs[:6], refs[6:]
            return kernel(*ins, None, *rest, scale=scale, causal=causal,
                          bq=bq, bk=bk)
        return no_mask

    # ---- dq: grid (B, Hq, nQ, nK-sequential) -------------------------------
    dq = pl.pallas_call(
        wrap(_dq_kernel),
        grid=(b, hq, sq // bq, skv // bk),
        in_specs=specs(lambda i, j: i, lambda i, j: j),
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda ib, ih, i, j: (ib, ih, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(*args)

    # ---- dk/dv: grid (B, Hq, nK, nQ-sequential) ----------------------------
    dk_h, dv_h = pl.pallas_call(
        wrap(_dkv_kernel),
        grid=(b, hq, skv // bk, sq // bq),
        in_specs=specs(lambda i, j: j, lambda i, j: i),
        out_specs=(
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, i, j: (ib, ih, i, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, i, j: (ib, ih, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, skv, d), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(*args)

    # GQA: sum q-head contributions into each KV head
    dk = dk_h.reshape(b, hkv, groups, skv, d).sum(2).astype(k.dtype)
    dv = dv_h.reshape(b, hkv, groups, skv, d).sum(2).astype(v.dtype)
    dq, dk, dv = (t.transpose(0, 2, 1, 3) for t in (dq, dk, dv))
    if d != d_orig:
        dq, dk, dv = (t[..., :d_orig] for t in (dq, dk, dv))
    return dq, dk, dv

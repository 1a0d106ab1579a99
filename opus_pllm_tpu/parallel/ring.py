"""Ring attention over a sequence-parallel mesh axis.

Activates the "seq" axis reserved in SURVEY §2c: contexts longer than one
chip's HBM shard along the sequence dim, and attention runs blockwise — each
device holds one Q/K/V sequence shard, K/V shards rotate around the ring via
`lax.ppermute` (neighbor hops ride ICI, never DCN), and softmax merges
per-block results with the streaming max/sum rule (the same online softmax
the flash kernels use). Nothing in the reference does this — its protocol
caps at 2.5k aa (dataset_loading.py's 2500 filter) — so this is a
beyond-parity lever for >4k-token prompts.

Memory per device: O(S/N) for Q/K/V/O plus one in-flight K/V shard — the
whole (S, S) score matrix never exists anywhere. Compute: causal masking is
applied per block; the ring still visits all N shards (a `cond`-skipped
lower triangle would desynchronize the collective permute, which must run
on every device every step), so causal ring attention does ~2x the FLOPs of
a perfectly-packed schedule. At the sizes that need SP the HBM win is the
point, not the FLOP schedule.

Layout contract (matches models/layers.attention): q/k/v are (B, S_loc, H,
D) LOCAL shards inside shard_map; `kv_mask` is the (B, S_loc) validity of
the local K/V shard; `q_global0` is the global position of the shard's
first query row (i.e. axis_index * S_loc for an evenly sharded sequence).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"
NEG_LARGE = -1e30


def ring_attention(q, k, v, kv_mask, *, axis_name: str = SEQ_AXIS,
                   causal: bool = True, scale: Optional[float] = None):
    """Blockwise ring attention on LOCAL shards (call inside shard_map).

    q: (B, S_loc, Hq, D); k, v: (B, S_loc, Hkv, D) with Hq % Hkv == 0
    (grouped-query, same contract as models/layers.attention — sequence
    parallelism is orthogonal to TP's head split).
    kv_mask: (B, S_loc) bool — validity of the local K/V rows.
    causal: global causal mask from ring-step-derived global INDICES
    (matches layers.causal_mask's index-based tril; right-pad contract).

    Returns (B, S_loc, Hq, D): this device's shard of the attention
    output, equal to single-device attention up to float reassociation.
    """
    n = jax.lax.psum(1, axis_name)                  # ring size (static)
    idx = jax.lax.axis_index(axis_name)
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = (1.0 / math.sqrt(d)) if scale is None else scale

    qf = (q.astype(jnp.float32) * scale).reshape(b, s_loc, hkv, g, d)
    q_pos = idx * s_loc + jnp.arange(s_loc)         # global query rows

    def merge(carry, kv_blk, src):
        m, l, acc = carry
        kb, vb, maskb = kv_blk
        # (B, Hkv, G, Sq, Skv) block scores in fp32
        s_blk = jnp.einsum("bqhgd,bkhd->bhgqk", qf,
                           kb.astype(jnp.float32))
        k_pos = src * s_loc + jnp.arange(s_loc)     # global key rows
        valid = maskb[:, None, None, None, :]       # (B, 1, 1, 1, Skv)
        if causal:
            valid = valid & (q_pos[None, None, None, :, None]
                             >= k_pos[None, None, None, None, :])
        s_blk = jnp.where(valid, s_blk, NEG_LARGE)
        m_new = jnp.maximum(m, jnp.max(s_blk, axis=-1))
        # all-masked rows keep m == m_new == NEG_LARGE (both finite), so
        # corr = exp(0) = 1 against zero accumulators — no NaN path
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s_blk - m_new[..., None])
        l = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhgqk,bkhd->bqhgd", p, vb.astype(jnp.float32))
        acc = acc * corr.transpose(0, 3, 1, 2)[..., None] + pv
        return m_new, l, acc

    def body(t, state):
        kb, vb, maskb, m, l, acc = state
        src = (idx - t) % n                         # origin of current shard
        if causal:
            # a shard strictly in this device's causal future contributes
            # nothing (every key index > every query index): skip its
            # whole merge — on average half the ring's attention FLOPs.
            # The ppermute below still runs every step on every device,
            # so the collective schedule stays aligned
            m, l, acc = jax.lax.cond(
                src <= idx,
                lambda c: merge(c, (kb, vb, maskb), src),
                lambda c: c,
                (m, l, acc))
        else:
            m, l, acc = merge((m, l, acc), (kb, vb, maskb), src)
        # rotate K/V (+ its mask) to the next device; the last merge needs
        # no send, but a uniform loop keeps every step's collective aligned
        perm = [(i, (i + 1) % n) for i in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        maskb = jax.lax.ppermute(maskb, axis_name, perm)
        return kb, vb, maskb, m, l, acc

    m0 = jnp.full((b, hkv, g, s_loc), NEG_LARGE, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, s_loc), jnp.float32)
    acc0 = jnp.zeros((b, s_loc, hkv, g, d), jnp.float32)
    # under shard_map's varying-manual-axes typing the freshly-created
    # accumulators are unvarying constants while the loop outputs vary
    # over the ring axis; mark them varying up front so the carry types
    # match (no-op outside a shard_map that tracks vma)
    try:
        from ..core.util import pvary
        m0, l0, acc0 = (pvary(x, axis_name) for x in (m0, l0, acc0))
    except (AttributeError, NameError):  # older JAX: no vma tracking
        pass
    _, _, _, m, l, acc = jax.lax.fori_loop(
        0, n, body, (k, v, kv_mask, m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2)[..., None]
    # a row with ZERO valid keys sees p = exp(NEG_LARGE - NEG_LARGE) = 1 at
    # every masked column, so it outputs the uniform mean of v — the same
    # uniform-softmax convention attention_xla produces for such rows
    # (downstream code never reads fully-masked rows); padded QUERY rows
    # attend over valid keys, exactly like attention_xla
    return out.reshape(b, s_loc, hq, d).astype(q.dtype)


def sharded_decode_attention(q, k_shard, v_shard, kv_mask, *,
                             axis_name: str = SEQ_AXIS,
                             scale: Optional[float] = None):
    """Decode attention over a SEQUENCE-SHARDED KV cache (call inside
    shard_map): every device holds the same replicated queries
    q (B, 1, Hq, D) and one shard of the cache k/v (B, S_loc, Hkv, D) with
    its validity kv_mask (B, S_loc); each computes a partial softmax over
    its shard and the partials merge with the log-sum-exp rule:

        m = pmax(m_i);  l = psum(l_i * e^(m_i - m));
        out = psum(acc_i * e^(m_i - m)) / l

    — two psums and a pmax per step, no cache movement. This is the math
    core of sequence-parallel DECODE (contexts whose KV cache exceeds one
    chip's HBM): the ring handles prefill (queries sharded), this handles
    decode (queries replicated, keys sharded). Engine integration is a
    pod-round item; the primitive is exact vs single-device attention
    (tests/test_ring_attention.py).

    A key slot masked on every device contributes nothing; slots must be
    valid on exactly ONE device (global ownership), or they are counted
    once per device that exposes them.
    """
    b, sq, hq, d = q.shape
    hkv = k_shard.shape[2]
    g = hq // hkv
    scale = (1.0 / math.sqrt(d)) if scale is None else scale

    qf = (q.astype(jnp.float32) * scale).reshape(b, sq, hkv, g, d)
    s_blk = jnp.einsum("bqhgd,bkhd->bhgqk", qf,
                       k_shard.astype(jnp.float32))
    s_blk = jnp.where(kv_mask[:, None, None, None, :], s_blk, NEG_LARGE)
    m_i = jnp.max(s_blk, axis=-1)                        # (B, Hkv, G, Sq)
    m = jax.lax.pmax(m_i, axis_name)
    p = jnp.exp(s_blk - m[..., None])
    # a fully-masked LOCAL shard: m == m_i == NEG_LARGE only if masked
    # everywhere globally; locally-masked columns contribute exp(<very
    # negative>) ~ 0 once any device holds a valid key
    l = jax.lax.psum(jnp.sum(p, axis=-1), axis_name)
    acc = jax.lax.psum(
        jnp.einsum("bhgqk,bkhd->bqhgd", p, v_shard.astype(jnp.float32)),
        axis_name)
    out = acc / jnp.maximum(l, 1e-30).transpose(0, 3, 1, 2)[..., None]
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def make_sp_mesh(n: Optional[int] = None, devices=None) -> Mesh:
    """1-D ("seq",) mesh — sequence parallelism over all (or n) devices."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    if n is not None:
        if n > len(devices):
            # silent truncation would halve the sharding a user sized for
            # HBM and OOM with no indication why (same contract as
            # core/mesh.make_mesh)
            raise ValueError(f"--seq-shards {n} > {len(devices)} devices")
        devices = devices[:n]
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


@functools.partial(jax.jit, static_argnames=("causal", "mesh"))
def ring_self_attention(mesh: Mesh, q, k, v, mask, *, causal: bool = True):
    """Mesh-level wrapper: GLOBAL (B, S, H, D) q/k/v and (B, S) mask,
    sequence-sharded over `mesh`'s "seq" axis via shard_map. S must divide
    evenly by the axis size (pad to a multiple and mask, as the engine's
    bucketed prompts already do)."""
    spec = P(None, SEQ_AXIS, None, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, SEQ_AXIS)),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, mask)

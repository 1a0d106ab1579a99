"""Sequence-sharded generation: the KV cache split over a ("seq",) mesh.

Completes the sequence-parallel story for INFERENCE (train/sp.py covers
training): when one prompt's KV cache exceeds a chip's HBM — the
long-context serving regime — the cache shards along its capacity axis
over the ring mesh and generation runs as:

  prefill : ring attention (parallel/ring.ring_attention) — each device
            embeds/projects its own S/N prompt shard, K/V shards rotate
            around the ICI ring, and each device's cache keeps exactly ITS
            shard's K/V (decoder._block's impl="ring" cache path). Per-
            device cache storage AND prefill activations are O(S/N).
  decode  : every device computes the (replicated) new token's K/V and
            appends it to its local cache tail, but only the LAST device
            marks those slots valid; attention is the LSE-merged partial
            softmax over shards (parallel/ring.sharded_decode_attention,
            impl="sp_decode") — a pmax and two psums per step, no cache
            movement.

Outputs are token-identical to infer/engine.generate (same sampling code,
replicated RNG; the only float difference is softmax reassociation across
shards). The reference has nothing comparable — its HF generate path is
single-GPU per replica (opus_llama.py:96-132); this is the beyond-parity
lever for contexts past one chip, composable with --quantize-cache.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.config import DecoderConfig
from ..models import decoder
from ..parallel.ring import SEQ_AXIS
from .engine import GenerateOutput, advance_sampling, cache_capacity


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "max_new_tokens", "temperature",
                     "top_p", "eos_token_id", "pad_token_id",
                     "stop_sequences", "quantize_cache"))
def generate_seq_sharded(params, cfg: DecoderConfig, input_embeds,
                         attn_mask, positions, rng, *, mesh,
                         max_new_tokens: int, temperature: float = 0.1,
                         top_p: float = 0.7, eos_token_id: int = -1,
                         pad_token_id: int = 0,
                         stop_sequences: Optional[tuple] = None,
                         quantize_cache=False) -> GenerateOutput:
    """engine.generate over a ("seq",) mesh (ring.make_sp_mesh): same
    argument surface (LEFT-padded (B, L, H) prompt embeddings), the prompt
    left-pads further to a multiple of the shard count so every device owns
    an equal slice."""
    n = mesh.shape[SEQ_AXIS]
    b, l, h = input_embeds.shape
    # dynamic-NTK bound: what forward() would derive inside the UNsharded
    # engine.generate (its cache capacity, incl. the flash-block rounding,
    # from the pre-shard-padding prompt length) — any other bound changes
    # the RoPE base on use_dynamic_ntk models and breaks token-identity
    ctx = cache_capacity(cfg, l, max_new_tokens)
    l_pad = -(-l // n) * n
    if l_pad != l:
        pz = l_pad - l
        input_embeds = jnp.pad(input_embeds, ((0, 0), (pz, 0), (0, 0)))
        attn_mask = jnp.pad(attn_mask, ((0, 0), (pz, 0)))
        positions = jnp.pad(positions, ((0, 0), (pz, 0)))
    l_loc = l_pad // n
    cap_loc = l_loc + max_new_tokens
    tail_len = max((len(s) for s in stop_sequences), default=0) \
        if stop_sequences else 0

    def local_gen(params, emb, mask, pos, key):
        idx = jax.lax.axis_index(SEQ_AXIS)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            x, idx * l_loc, l_loc, axis=1)
        emb_s = sl(emb).astype(cfg.jnp_dtype)
        mask_s, pos_s = sl(mask), sl(pos)

        cache = decoder.init_cache(cfg, b, cap_loc, dtype=cfg.jnp_dtype,
                                   stacked="layers_stacked" in params,
                                   quantize=quantize_cache)
        cache["mask"] = cache["mask"].at[:, :l_loc].set(mask_s)
        # ring prefill: attends over the rotating fresh K/V shards, stores
        # this device's shard at local slots [0, l_loc)
        hid, cache = decoder.forward(params, cfg, emb_s, pos_s, mask_s,
                                     cache, impl="ring", return_hidden=True,
                                     ntk_ctx=ctx)
        # the real last prompt row (left-pad) lives on the LAST shard
        lg_loc = decoder.head_logits(params, cfg,
                                     hid[:, -1:])[:, 0].astype(jnp.float32)
        last = idx == n - 1
        last_logits = jax.lax.psum(jnp.where(last, lg_loc, 0.0), SEQ_AXIS)
        last_pos = pos[:, -1]

        def cond(state):
            step, done, *_ = state
            return (step < max_new_tokens) & ~jnp.all(done)

        def body(state):
            step, done, cur_logits, cache, key, out, tail, nwritten = state
            nxt, new_done, key, out, tail, nwritten = advance_sampling(
                step, done, cur_logits, key, out, tail, nwritten,
                temperature=temperature, top_p=top_p,
                pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                stop_sequences=stop_sequences, tail_len=tail_len)

            emb1 = decoder.embed_tokens(params, nxt)[:, None].astype(
                cfg.jnp_dtype)
            pos1 = (last_pos + 1 + step)[:, None]
            # every device appends the (replicated) token K/V to its local
            # tail; ONLY the last device marks the slot valid — a slot must
            # be owned by exactly one shard for the LSE merge
            cache["mask"] = jax.lax.dynamic_update_slice(
                cache["mask"], (~done & last)[:, None], (0, l_loc + step))
            lg, cache = decoder.forward(params, cfg, emb1, pos1,
                                        cache["mask"], cache,
                                        impl="sp_decode", ntk_ctx=ctx)
            return (step + 1, new_done, lg[:, 0].astype(jnp.float32),
                    cache, key, out, tail, nwritten)

        out0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
        tail0 = jnp.full((b, max(tail_len, 1)), -1, jnp.int32)
        state = (jnp.int32(0), jnp.zeros((b,), bool), last_logits, cache,
                 key, out0, tail0, jnp.zeros((b,), jnp.int32))
        _, _, _, _, _, out, _, nwritten = jax.lax.while_loop(
            cond, body, state)
        return out, nwritten

    sharded = jax.shard_map(local_gen, mesh=mesh,
                            in_specs=(P(), P(), P(), P(), P()),
                            out_specs=(P(), P()))
    out, nwritten = sharded(params, input_embeds, attn_mask, positions, rng)
    return GenerateOutput(out, nwritten)

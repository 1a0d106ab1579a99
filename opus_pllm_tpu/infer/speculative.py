"""Speculative decoding: draft-proposed, target-verified multi-token steps.

Beyond-parity serving feature (the reference has nothing comparable; its
decode path is HF `generate`, opus_llama.py:96-132). Decode at small batch
is weight-streaming bound (BENCH_NOTES.md): one verify pass of K tokens
streams the target's weights ONCE for up to K+1 emitted tokens, so with a
cheap draft and a well-matched distribution the tokens/sec ceiling rises
by the acceptance rate. Output is TOKEN-IDENTICAL to greedy
`engine.generate` on the target model BY CONSTRUCTION — every emitted
token is the target's own argmax conditioned on a fully-verified prefix —
so the draft model only ever affects speed, never output.

TPU-native shape discipline:
  * fixed draft depth K per iteration (one jitted while_loop body);
  * batch rows advance in LOCKSTEP at the MINIMUM acceptance across
    active rows — every cache write keeps a batch-uniform slot index, so
    there is no per-row scatter on the hot path. Batch 1 (the
    latency-serving case) always gets its full per-step acceptance;
    larger batches trade some acceptance for uniform shapes.
  * both KV caches over-allocate K slots; rejected drafts are simply
    left stale beyond the valid index and masked out of attention.

Greedy only (temperature 0): the uniform-acceptance rule compares draft
proposals against target argmaxes. The standard stochastic accept/reject
generalization slots into `_accept_counts` if sampling is ever needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..models import decoder
from .engine import GenerateOutput


class SpecOutput(NamedTuple):
    tokens: jnp.ndarray     # (B, max_new) int32, pad after EOS
    lengths: jnp.ndarray    # (B,) generated incl. EOS
    iterations: jnp.ndarray  # () int32: verify passes used (speed probe:
    #                           max_new/iterations ~= tokens per weight pass)


def _decode_mask(prompt_mask, cap: int, upto):
    """(B, 1, 1, cap) valid-slot mask: prompt slots per attn_mask, decode
    slots valid iff col < upto (stale speculative slots excluded)."""
    b, l = prompt_mask.shape
    cols = jnp.arange(cap)[None, :]
    base = jnp.concatenate(
        [prompt_mask, jnp.ones((b, cap - l), bool)], axis=1)
    return (base & (cols < upto))[:, None, None, :]


def _one_step(params, cfg, cache_mask_fn, cache, emb, pos, slot, impl):
    """Single-token decode step at a batch-uniform slot; returns logits."""
    hid, cache = decoder.forward(
        params, cfg, emb, pos, cache_mask_fn(slot + 1), cache, impl=impl,
        return_hidden=True)
    lg = decoder.head_logits(params, cfg, hid)[:, -1].astype(jnp.float32)
    return lg, cache


def draft_from_target(params, cfg: DecoderConfig, n_layers: int):
    """Self-speculative (layer-skip) draft: the target's own FIRST
    n_layers with its embedding, final norm, and head — a draft with no
    extra weights that shares the target's embedding space, so the same
    (spliced) prompt embeddings feed both models. Early-exit drafting is
    the standard zero-cost draft; acceptance only affects speed, never
    output (every emitted token is target-verified).

    Unrolled layout shares the layer subtrees by reference; stacked
    layout slices the leading layer axis (one small device copy)."""
    if not 0 < n_layers < cfg.num_layers:
        raise ValueError(f"draft_layers must be in [1, {cfg.num_layers - 1}]"
                         f" (target has {cfg.num_layers} layers), "
                         f"got {n_layers}")
    import dataclasses
    dcfg = dataclasses.replace(cfg, num_layers=n_layers)
    dp = {k: v for k, v in params.items()
          if k not in ("layers", "layers_stacked")}
    if "layers_stacked" in params:
        dp["layers_stacked"] = jax.tree.map(lambda a: a[:n_layers],
                                            params["layers_stacked"])
    else:
        dp["layers"] = params["layers"][:n_layers]
    return dp, dcfg


@functools.partial(
    jax.jit,
    static_argnames=("cfg_draft", "cfg", "n_draft", "max_new_tokens",
                     "eos_token_id", "pad_token_id", "impl",
                     "quantize_cache"))
def speculative_generate(draft_params, params, cfg_draft: DecoderConfig,
                         cfg: DecoderConfig, input_embeds,
                         draft_input_embeds, attn_mask, positions, *,
                         max_new_tokens: int, n_draft: int = 4,
                         eos_token_id: int = -1, pad_token_id: int = 0,
                         quantize_cache=False,
                         impl: str = "auto") -> GenerateOutput:
    """Greedy speculative decode; returns engine.GenerateOutput.

    input_embeds / draft_input_embeds: (B, L, H_target) / (B, L, H_draft)
    LEFT-padded prompt embeddings under each model's own embedding space
    (the multimodal splicer produces them per model). attn_mask/positions
    (B, L) as in engine.generate. n_draft = K proposals per verify pass.
    """
    out = _speculative(draft_params, params, cfg_draft, cfg, input_embeds,
                       draft_input_embeds, attn_mask, positions,
                       max_new_tokens, n_draft, eos_token_id, pad_token_id,
                       quantize_cache, impl)
    return GenerateOutput(out.tokens, out.lengths)


def _speculative(draft_params, params, cfg_draft, cfg, input_embeds,
                 draft_input_embeds, attn_mask, positions, max_new_tokens,
                 K, eos_id, pad_id, quantize_cache, impl) -> SpecOutput:
    b, l, _ = input_embeds.shape
    cap = l + max_new_tokens + K          # slack: last chunk may overshoot

    def init(p, c, emb):
        cache = decoder.init_cache(c, b, cap, dtype=c.jnp_dtype,
                                   stacked="layers_stacked" in p,
                                   quantize=quantize_cache)
        cache["mask"] = cache["mask"].at[:, :l].set(attn_mask)
        rows = jnp.arange(l)[None, None, :, None]
        cols = jnp.arange(cap)[None, None, None, :]
        m4 = cache["mask"][:, None, None, :] & (cols <= rows)
        hid, cache = decoder.forward(p, c, emb.astype(c.jnp_dtype),
                                     positions, m4, cache, impl=impl,
                                     return_hidden=True)
        lg = decoder.head_logits(p, c, hid[:, -1:])[:, 0].astype(jnp.float32)
        return cache, lg

    t_cache, t_logits = init(params, cfg, input_embeds)
    d_cache, _ = init(draft_params, cfg_draft, draft_input_embeds)

    t_mask = functools.partial(_decode_mask, attn_mask, cap)
    last_pos = positions[:, -1]

    # first token comes straight from the target prefill (as in generate)
    t1 = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)
    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(t1)
    done0 = (t1 == eos_id) | (max_new_tokens <= 1)
    nw0 = jnp.ones((b,), jnp.int32)

    def chunk_positions(lp):
        return lp[:, None] + 1 + jnp.arange(K)[None, :]          # (B, K)

    def cond(s):
        done = s[0]
        return ~jnp.all(done)

    def body(s):
        (done, out, nw, t_last, t_cache, d_cache, idx, last_pos, iters) = s
        # idx: batch-uniform count of VALID cache slots (prompt + accepted)

        # --- draft phase: K single-token steps, proposals d[:, 0..K-1] ---
        def draft_step(carry, j):
            cache, tok = carry
            emb = decoder.embed_tokens(
                draft_params, jnp.maximum(tok, 0)
            ).astype(cfg_draft.jnp_dtype)[:, None]
            # position of `tok` = last_pos + 1 + j; written at slot idx + j
            pos = (last_pos + 1 + j)[:, None]
            sub = {"layers": cache["layers"], "index": idx + j,
                   "mask": cache["mask"]}
            lg, sub = _one_step(draft_params, cfg_draft, t_mask, sub, emb,
                                pos, idx + j, impl)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return ({"layers": sub["layers"], "index": cache["index"],
                     "mask": cache["mask"]}, nxt), nxt

        (d_cache, _), d_prop = jax.lax.scan(
            draft_step, (d_cache, t_last), jnp.arange(K))
        d_prop = d_prop.transpose(1, 0)                          # (B, K)
        # chunk fed to the target: [t_last, d_1 .. d_{K-1}]
        chunk = jnp.concatenate([t_last[:, None], d_prop[:, :K - 1]], axis=1)

        # --- target verify: ONE forward over the K-token chunk -----------
        emb = decoder.embed_tokens(
            params, jnp.maximum(chunk, 0)).astype(cfg.jnp_dtype)
        cpos = chunk_positions(last_pos)                          # (B, K)
        cols = jnp.arange(cap)[None, None, None, :]
        rows = jnp.arange(K)[None, None, :, None]
        # base allows the whole chunk window [idx, idx+K) (written by this
        # very forward before attention reads it); causal term restricts
        # chunk row j to cols <= idx + j
        m4 = t_mask(idx + K) & (cols <= idx + rows)              # (B,1,K,cap)
        sub = {"layers": t_cache["layers"], "index": idx,
               "mask": t_cache["mask"]}
        hid, sub = decoder.forward(params, cfg, emb, cpos, m4, sub,
                                   impl=impl, return_hidden=True)
        t_cache = {"layers": sub["layers"], "index": t_cache["index"],
                   "mask": t_cache["mask"]}
        v = jnp.argmax(decoder.head_logits(params, cfg, hid)
                       .astype(jnp.float32), axis=-1).astype(jnp.int32)
        # v[:, j] = target argmax after ...chunk[0..j] — v[:, 0] is the true
        # next token after t_last; proposal d_prop[:, j] verifies vs v[:, j]

        # --- uniform acceptance: min over ACTIVE rows ---------------------
        match = (d_prop[:, :K - 1] == v[:, :K - 1])              # (B, K-1)
        a_row = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        a_row = jnp.where(done, K - 1, a_row)    # done rows don't constrain
        a = jnp.min(a_row)                       # scalar, 0..K-1
        n_emit = a + 1                           # v[:, 0..a] all verified

        # --- emit v[:, 0..a] with done/budget masking ---------------------
        def emit(j, st):
            out, nw, done = st
            tok = v[:, j]
            write = (~done) & (j < n_emit) & (nw < max_new_tokens)
            out = out.at[jnp.arange(b), jnp.minimum(nw, max_new_tokens - 1)
                         ].set(jnp.where(write, tok, out[jnp.arange(b),
                               jnp.minimum(nw, max_new_tokens - 1)]))
            nw = nw + write.astype(jnp.int32)
            done = done | (write & (tok == eos_id))
            return out, nw, done

        out, nw, done = jax.lax.fori_loop(0, K, emit, (out, nw, done))
        done = done | (nw >= max_new_tokens)

        t_last = v[jnp.arange(b), a]             # last verified emission
        idx = idx + n_emit                       # t_last..d_a now cached
        last_pos = last_pos + n_emit
        return (done, out, nw, t_last, t_cache, d_cache, idx, last_pos,
                iters + 1)

    state = (done0, out0, nw0, t1, t_cache, d_cache,
             jnp.asarray(l, jnp.int32), last_pos, jnp.zeros((), jnp.int32))
    done, out, nw, *_, iters = jax.lax.while_loop(cond, body, state)
    return SpecOutput(out, nw, iters)

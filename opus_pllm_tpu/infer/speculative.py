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

Sampling (temperature > 0) uses rejection-verified speculative sampling:
the draft PROPOSES from its warped distribution q_j, the target accepts
proposal j with prob min(1, p_j(d_j)/q_j(d_j)) and resamples the
residual norm(max(p_j - q_j, 0)) at the first rejection (a plain p
sample on full acceptance) — per position the emitted token is
distributed EXACTLY as plain sampling, so the draft only ever affects
speed for sampled decoding too. That matters because the reference's
default decode is sampled (run_opus_ddp.py:156-158: do_sample, T=0.1,
top_p=0.7) — greedy-only speculation would be a no-op on its primary
workload. The static path truncates acceptance at the batch-minimum
(shape discipline above); truncating an accepted prefix is
distribution-neutral — the dropped proposals are regenerated with fresh
randomness next iteration, which is just the sequential procedure
restarted — and the batch-uniform emission slot `a` still emits each
row's OWN token there (its accepted draft, its residual resample, or its
full-acceptance bonus). The serving engine's speculative tick
(serve/engine.py `_build_spec_decode_step`) uses the same
`accept_and_emit` rule with fully per-row acceptance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig
from ..models import decoder
from .engine import GenerateOutput


def accept_and_emit(props, q_probs, v, p_probs, greedy, key):
    """Per-row speculative acceptance + emission for one verify pass.

    props   (B, K-1) int32   draft proposals d_1..d_{K-1}
    q_probs (B, K-1, V) fp32 warped draft distributions q_j (the exact
                             distributions the proposals were drawn from,
                             engine.warp_probs_rows; unused on greedy rows)
    v       (B, K) int32     target argmaxes after chunk[0..j]
    p_probs (B, K, V) fp32   warped target distributions p_j (what plain
                             decode would sample from at each position)
    greedy  (B,) bool        rows with temperature <= 0
    key                      PRNG key for acceptance uniforms + resampling

    Returns (emit (B, K) int32, n_emit (B,) int32): each row's emitted
    tokens emit[:, :n_emit].

    Greedy rows: accept while d_j == argmax p_j, then emit the target
    argmax as a bonus — token-identical to plain greedy decode.

    Sampled rows (speculative sampling, rejection-verified): accept d_j
    with prob min(1, p_j(d_j)/q_j(d_j)); at the first rejection emit one
    token from the residual norm(max(p_j - q_j, 0)); on full acceptance
    emit a bonus sample from p_{K-1}. Per position, P[emit x] =
    q(x)min(1, p(x)/q(x)) + P[reject]*residual(x) = p(x) exactly — the
    output distribution equals plain per-token sampling, the draft only
    affects speed (tests/test_speculative.py Monte-Carlo check +
    tests/test_serve_spec.py engine-level statistical equivalence).
    """
    b, km1 = props.shape
    K = km1 + 1
    k_u, k_res = jax.random.split(key)

    p_tok = jnp.take_along_axis(p_probs[:, :km1], props[..., None],
                                axis=-1)[..., 0]                  # (B, K-1)
    q_tok = jnp.take_along_axis(q_probs, props[..., None],
                                axis=-1)[..., 0]                  # (B, K-1)
    u = jax.random.uniform(k_u, (b, km1))
    # u < p/q, written mul-form so q == 0 (impossible for a q-drawn
    # proposal, but safe) rejects instead of dividing by zero
    acc_samp = u * q_tok < p_tok
    acc_greedy = props == v[:, :km1]
    acc = jnp.where(greedy[:, None], acc_greedy, acc_samp)
    a_row = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1),
                    axis=1)                                       # 0..K-1

    # bonus token at position a_row: residual resample on rejection,
    # plain target sample on full acceptance (q := 0 there, so the
    # residual IS p), target argmax on greedy rows
    p_bon = jnp.take_along_axis(
        p_probs, a_row[:, None, None], axis=1)[:, 0]              # (B, V)
    q_bon = jnp.take_along_axis(
        q_probs, jnp.minimum(a_row, km1 - 1)[:, None, None], axis=1)[:, 0]
    q_bon = jnp.where((a_row < km1)[:, None], q_bon, 0.0)
    resid = jnp.maximum(p_bon - q_bon, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    # residual mass ~0 only when p == q pointwise (rejection prob ~0:
    # numerically unreachable, but a zero distribution must not NaN)
    resid = jnp.where(rs > 1e-9, resid, p_bon)
    bonus_sampled = jax.random.categorical(
        k_res, jnp.log(jnp.maximum(resid, 1e-38))).astype(jnp.int32)
    bonus_greedy = jnp.take_along_axis(v, a_row[:, None], axis=1)[:, 0]
    bonus = jnp.where(greedy, bonus_greedy, bonus_sampled)

    cols = jnp.arange(K)[None, :]
    props_pad = jnp.concatenate([props, props[:, -1:]], axis=1)   # (B, K)
    emit = jnp.where(cols < a_row[:, None], props_pad,
                     jnp.where(cols == a_row[:, None], bonus[:, None], 0))
    return emit.astype(jnp.int32), a_row + 1


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
                     "quantize_cache", "temperature", "top_p"))
def speculative_generate(draft_params, params, cfg_draft: DecoderConfig,
                         cfg: DecoderConfig, input_embeds,
                         draft_input_embeds, attn_mask, positions, *,
                         max_new_tokens: int, n_draft: int = 4,
                         eos_token_id: int = -1, pad_token_id: int = 0,
                         quantize_cache=False, temperature: float = 0.0,
                         top_p: float = 1.0, rng=None,
                         impl: str = "auto") -> GenerateOutput:
    """Speculative decode; returns engine.GenerateOutput.

    input_embeds / draft_input_embeds: (B, L, H_target) / (B, L, H_draft)
    LEFT-padded prompt embeddings under each model's own embedding space
    (the multimodal splicer produces them per model). attn_mask/positions
    (B, L) as in engine.generate. n_draft = K proposals per verify pass.

    temperature == 0 (default): greedy, token-identical to
    engine.generate by construction. temperature > 0: rejection-verified
    speculative sampling under the same T/top_p warp as engine.generate —
    distribution-identical to plain sampling per position (module doc);
    pass `rng` as engine.generate's key argument.
    """
    out = _speculative(draft_params, params, cfg_draft, cfg, input_embeds,
                       draft_input_embeds, attn_mask, positions,
                       max_new_tokens, n_draft, eos_token_id, pad_token_id,
                       quantize_cache, temperature, top_p, rng, impl)
    return GenerateOutput(out.tokens, out.lengths)


def _speculative(draft_params, params, cfg_draft, cfg, input_embeds,
                 draft_input_embeds, attn_mask, positions, max_new_tokens,
                 K, eos_id, pad_id, quantize_cache, temperature, top_p,
                 rng, impl) -> SpecOutput:
    b, l, _ = input_embeds.shape
    do_sample = temperature > 0          # static: picks the trace below
    if rng is None:
        rng = jax.random.PRNGKey(0)
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
    rng, k1 = jax.random.split(rng)
    if do_sample:
        from .engine import sample_token
        t1 = sample_token(t_logits, k1, temperature, top_p)
    else:
        t1 = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)
    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out0 = out0.at[:, 0].set(t1)
    done0 = (t1 == eos_id) | (max_new_tokens <= 1)
    nw0 = jnp.ones((b,), jnp.int32)
    temps = jnp.full((b,), temperature, jnp.float32)
    tops = jnp.full((b,), top_p, jnp.float32)

    def chunk_positions(lp):
        return lp[:, None] + 1 + jnp.arange(K)[None, :]          # (B, K)

    def cond(s):
        done = s[0]
        return ~jnp.all(done)

    def body(s):
        (done, out, nw, t_last, t_cache, d_cache, idx, last_pos, key,
         iters) = s
        # idx: batch-uniform count of VALID cache slots (prompt + accepted)
        key, k_draft, k_acc = jax.random.split(key, 3)

        # --- draft phase: K single-token steps, proposals d[:, 0..K-1] ---
        # greedy: argmax proposals. sampled: proposals drawn from the
        # draft's warped distribution q_j, which rides along for the
        # rejection test (accept_and_emit)
        def draft_step(carry, jk):
            j, dk = jk
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
            if do_sample:
                from .engine import warp_logits_rows
                warped = warp_logits_rows(lg, temps, tops)
                nxt = jax.random.categorical(dk, warped).astype(jnp.int32)
                q = jax.nn.softmax(warped, axis=-1)
            else:
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                q = jnp.zeros((), jnp.float32)       # unused on this trace
            return ({"layers": sub["layers"], "index": cache["index"],
                     "mask": cache["mask"]}, nxt), (nxt, q)

        (d_cache, _), (d_prop, qs) = jax.lax.scan(
            draft_step, (d_cache, t_last),
            (jnp.arange(K), jax.random.split(k_draft, K)))
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
        lg = decoder.head_logits(params, cfg, hid).astype(jnp.float32)
        v = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        # v[:, j] = target argmax after ...chunk[0..j] — v[:, 0] is the true
        # next token after t_last; proposal d_prop[:, j] verifies vs v[:, j]

        # --- uniform acceptance: min over ACTIVE rows ---------------------
        if do_sample:
            from .engine import warp_probs_rows
            ps = warp_probs_rows(lg, temps[:, None], tops[:, None])
            p_tok = jnp.take_along_axis(
                ps[:, :K - 1], d_prop[:, :K - 1, None], axis=-1)[..., 0]
            q_tok = jnp.take_along_axis(
                qs.transpose(1, 0, 2)[:, :K - 1],
                d_prop[:, :K - 1, None], axis=-1)[..., 0]
            u = jax.random.uniform(k_acc, (b, K - 1))
            # u < p/q in mul form (q == 0 rejects instead of dividing)
            acc = u * q_tok < p_tok
        else:
            acc = (d_prop[:, :K - 1] == v[:, :K - 1])            # (B, K-1)
        a_row = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        a_full = a_row                           # per-row, for the bonus
        a_row = jnp.where(done, K - 1, a_row)    # done rows don't constrain
        a = jnp.min(a_row)                       # scalar, 0..K-1
        n_emit = a + 1

        # --- emission matrix E[:, 0..a] ----------------------------------
        if do_sample:
            # positions < a: accepted drafts. position a, per row: its
            # accepted draft (a_full > a), its residual resample (rejected
            # exactly at a), or a p-sample (full acceptance a == K-1) —
            # distribution-identical to plain sampling (module doc)
            p_bon = jax.lax.dynamic_index_in_dim(ps, a, 1, keepdims=False)
            q_bon = jax.lax.dynamic_index_in_dim(
                qs, jnp.minimum(a, K - 2), 0, keepdims=False)     # (B, V)
            q_bon = jnp.where(a < K - 1, q_bon, 0.0)
            resid = jnp.maximum(p_bon - q_bon, 0.0)
            rs = jnp.sum(resid, axis=-1, keepdims=True)
            resid = jnp.where(rs > 1e-9, resid, p_bon)
            key, k_res = jax.random.split(key)
            bonus = jax.random.categorical(
                k_res, jnp.log(jnp.maximum(resid, 1e-38))).astype(jnp.int32)
            d_at_a = jax.lax.dynamic_index_in_dim(d_prop, a, 1,
                                                  keepdims=False)
            bonus = jnp.where(a_full > a, d_at_a, bonus)
            ar = jnp.arange(K)[None, :]
            E = jnp.where(ar < a, d_prop,
                          jnp.where(ar == a, bonus[:, None], 0))
        else:
            E = v                 # matched prefix == drafts; bonus = argmax

        # --- emit E[:, 0..a] with done/budget masking ---------------------
        def emit(j, st):
            out, nw, done = st
            tok = E[:, j]
            write = (~done) & (j < n_emit) & (nw < max_new_tokens)
            out = out.at[jnp.arange(b), jnp.minimum(nw, max_new_tokens - 1)
                         ].set(jnp.where(write, tok, out[jnp.arange(b),
                               jnp.minimum(nw, max_new_tokens - 1)]))
            nw = nw + write.astype(jnp.int32)
            done = done | (write & (tok == eos_id))
            return out, nw, done

        out, nw, done = jax.lax.fori_loop(0, K, emit, (out, nw, done))
        done = done | (nw >= max_new_tokens)

        t_last = E[jnp.arange(b), a]             # last verified emission
        idx = idx + n_emit                       # t_last..d_a now cached
        last_pos = last_pos + n_emit
        return (done, out, nw, t_last, t_cache, d_cache, idx, last_pos,
                key, iters + 1)

    state = (done0, out0, nw0, t1, t_cache, d_cache,
             jnp.asarray(l, jnp.int32), last_pos, rng,
             jnp.zeros((), jnp.int32))
    done, out, nw, *_, iters = jax.lax.while_loop(cond, body, state)
    return SpecOutput(out, nw, iters)

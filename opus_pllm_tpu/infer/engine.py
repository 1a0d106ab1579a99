"""Batched KV-cache generation engine.

TPU-native replacement for HF `generate` as driven by the reference runners
(run_opus_ddp.py:120-132, opus_llama.py:96-132): left-padded prompt
*embeddings* in (generate is always called with inputs_embeds, so outputs
contain no prompt ids), greedy or temperature/top-p sampling out.

The whole prefill+decode pipeline is one jitted function over static shapes:
prefill fills a fixed-capacity cache, then a `lax.while_loop` emits one token
per step with early exit when every row has hit EOS. Reference behavioral
quirks preserved: `do_sample iff temperature > 0` (run_opus_ddp.py:126),
defaults T=0.1 / top_p=0.7 / greedy beams=1.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import DecoderConfig, GenerationConfig
from ..models import decoder


class GenerateOutput(NamedTuple):
    tokens: jnp.ndarray    # (B, max_new) int32, pad_token after EOS
    lengths: jnp.ndarray   # (B,) tokens generated incl. EOS


def make_stop_sequences(token_lists) -> Optional[tuple]:
    """Stop-token suffixes -> hashable static arg for generate.

    TPU-native KeywordsStoppingCriteria (mm_utils.py:43-75): instead of
    decoding to text each step, a rolling window of the last K generated
    ids is compared against each stop suffix inside the jitted loop.
    """
    if not token_lists:
        return None
    return tuple(tuple(int(t) for t in seq) for seq in token_lists if seq)


def cache_capacity(cfg: DecoderConfig, l: int, max_new_tokens: int) -> int:
    """KV-cache capacity for an L-token prompt + max_new_tokens decode.

    Rounds to the flash kernel's KV block so the prefill attention
    qualifies for the Pallas path (+29% prefill at d=128) — only when the
    prompt shape can actually take that path; otherwise the exact capacity
    avoids inflating short-chat caches. Also the dynamic-NTK context bound
    `forward` derives when ntk_ctx is unset, so any engine that shards or
    re-buckets the cache must pass cache_capacity(cfg, l, max_new) as
    ntk_ctx to stay token-identical with generate().
    """
    from ..kernels.flash_attention import DEFAULT_BLOCK_K

    cap = l + max_new_tokens
    if cfg.head_dim % 128 == 0 and l % 8 == 0:
        cap = -(-cap // DEFAULT_BLOCK_K) * DEFAULT_BLOCK_K
    return cap


def advance_sampling(step, done, cur_logits, key, out, tail, nwritten, *,
                     temperature, top_p, pad_token_id, eos_token_id,
                     stop_sequences, tail_len):
    """One decode step's sampling/stopping bookkeeping, shared by the
    generate() and generate_seq_sharded() loop bodies so the stopping
    semantics (EOS, rolling stop-sequence tail, pad-after-done, lengths)
    cannot silently diverge between the two engines.

    Returns (next_token, new_done, key, out, tail, nwritten).
    """
    key, sub = jax.random.split(key)
    nxt = sample_token(cur_logits, sub, temperature, top_p)
    nxt = jnp.where(done, pad_token_id, nxt)
    out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, step))
    nwritten = nwritten + (~done).astype(jnp.int32)
    new_done = done | (nxt == eos_token_id)
    if tail_len > 0:
        tail = jnp.concatenate([tail[:, 1:], nxt[:, None]], axis=1)
        for seq in stop_sequences:
            sl = len(seq)
            hit = jnp.all(
                tail[:, tail_len - sl:] == jnp.asarray(seq, jnp.int32),
                axis=1) & (step + 1 >= sl)
            new_done = new_done | hit
    return nxt, new_done, key, out, tail, nwritten


def nucleus_kth(probs, top_ps, *, iters: int = 50):
    """Per-row nucleus boundary probability, WITHOUT a full-vocab sort.

    The sorted-prefix construction (keep the smallest prefix of the
    descending distribution whose cumulative mass reaches top_p, ties at
    the boundary included) is equivalent to a threshold rule:
        kth = max{ p in probs : mass(probs >= p) >= top_p }
    and the kept set is {probs >= kth}. mass(probs >= tau) is monotone
    decreasing in tau and crosses top_p exactly at kth, so kth falls out
    of a plain bisection over tau in [0, 1] — `iters` elementwise
    masked-sum passes over (.., V) instead of an O(V log^2 V) lane-permute
    sort network. On a v5e the (32, 128k) sort costs about as much as an
    entire int4 8B weight pass per decode step; this is the sampled-decode
    hot path (the reference's default decode is do_sample T=0.1/top_p=0.7,
    run_opus_ddp.py:156-158).

    Exactness: after `iters` halvings the bracket around kth is 2^-iters,
    below the fp32 ulp spacing of any boundary prob >= 1e-7; a boundary
    falling in a sub-1e-7 dust tail can shift the mask by tokens of total
    mass < 1e-7 (locked against the sorted reference construction in
    tests/test_sampling_nucleus.py).

    probs (..., V) fp32; top_ps broadcast to probs.shape[:-1].
    """
    shape = probs.shape[:-1]
    tp = jnp.broadcast_to(top_ps, shape).astype(jnp.float32)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid[..., None], probs, 0.0),
                       axis=-1)
        ge = mass >= tp
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, iters, body,
        (jnp.zeros(shape, jnp.float32), jnp.ones(shape, jnp.float32)))
    # hi converged to kth from above (mass(>=hi) < tp always), closer than
    # one ulp: the largest prob <= hi IS the boundary prob
    return jnp.max(jnp.where(probs <= hi[..., None], probs, 0.0), axis=-1)


def sample_token(logits, key, temperature: float, top_p: float):
    """Temperature + nucleus sampling over (B, V) fp32 logits.

    HF semantics: keep the smallest prefix of the sorted distribution whose
    cumulative probability reaches top_p (always keeping the best token);
    the boundary is computed sort-free (nucleus_kth).
    """
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        kth = nucleus_kth(probs, jnp.float32(top_p))
        logits = jnp.where(probs >= kth[:, None], logits, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def warp_logits_rows(logits, temps, top_ps):
    """Per-row temperature scaling + HF nucleus mask over (..., V) fp32
    logits; temps/top_ps broadcast to logits.shape[:-1]. The SINGLE
    definition of the sampling distribution: sample_token_rows draws a
    categorical from it and warp_probs_rows softmaxes it, so the serving
    engine's plain sampling and the speculative-sampling acceptance
    ratios (serve spec decode) can never use different warps. The
    full-vocab nucleus sort is gated behind a lax.cond so all-top_p=1
    batches (greedy/temperature traffic) never pay for it.
    """
    shape = logits.shape[:-1]
    t = jnp.broadcast_to(temps, shape)
    tp = jnp.broadcast_to(top_ps, shape)
    lg = logits.astype(jnp.float32) / jnp.maximum(t, 1e-6)[..., None]
    # rows that actually sample through the nucleus: greedy rows (t <= 0)
    # take the argmax downstream, so masking them is pure waste (the spec
    # verify pass warps every row's distribution — greedy-only traffic
    # must not pay the nucleus pass at all)
    need = (tp < 1.0) & (t > 0.0)

    def nucleus(lg):
        probs = jax.nn.softmax(lg, axis=-1)
        kth = nucleus_kth(probs, tp)
        drop = need[..., None] & (probs < kth[..., None])
        return jnp.where(drop, -jnp.inf, lg)

    return jax.lax.cond(jnp.any(need), nucleus, lambda x: x, lg)


def warp_probs_rows(logits, temps, top_ps):
    """The per-row sampling DISTRIBUTION (..., V) that sample_token_rows
    draws from — softmax of the warped logits. Rejection-verified
    speculative sampling computes its acceptance ratios p/q and residual
    max(p - q, 0) from these, which is what makes its output
    distribution-identical to plain sampling."""
    return jax.nn.softmax(warp_logits_rows(logits, temps, top_ps), axis=-1)


def sample_token_rows(logits, key, temps, top_ps):
    """Per-row temperature + nucleus sampling over (B, V) fp32 logits —
    the vector counterpart of sample_token for the serving engine's
    mixed-request batches (each slot carries its own T / top_p). Rows
    with temp <= 0 take the argmax; the nucleus mask matches
    sample_token's HF semantics exactly (same construction via
    warp_logits_rows).
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    masked = warp_logits_rows(logits, temps, top_ps)
    sampled = jax.random.categorical(key, masked).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_p",
                     "eos_token_id", "pad_token_id", "impl",
                     "stop_sequences", "quantize_cache"))
def generate(params, cfg: DecoderConfig, input_embeds, attn_mask, positions,
             rng, *, max_new_tokens: int, temperature: float = 0.1,
             top_p: float = 0.7, eos_token_id: int = -1, pad_token_id: int = 0,
             stop_sequences: Optional[tuple] = None,
             quantize_cache=False,
             impl: str = "auto") -> GenerateOutput:
    """input_embeds (B, L, H) LEFT-padded; attn_mask/positions (B, L).

    stop_sequences: tuple of token-id tuples (make_stop_sequences); a row
    finishes when its generated tail matches any suffix (or hits EOS).
    quantize_cache: True/"int8" = int8 KV cache (half the cache HBM
    footprint/traffic); "int4" = packed 4-bit cache (quarter), for
    batch >= 32 / long contexts.
    """
    b, l, h = input_embeds.shape
    tail_len = max((len(s) for s in stop_sequences), default=0) \
        if stop_sequences else 0
    cap = cache_capacity(cfg, l, max_new_tokens)
    cache = decoder.init_cache(cfg, b, cap, dtype=cfg.jnp_dtype,
                               stacked="layers_stacked" in params,
                               quantize=quantize_cache)
    cache["mask"] = cache["mask"].at[:, :l].set(attn_mask)

    # prefill: causal over the prompt, nothing beyond slot l
    rows = jnp.arange(l)[None, None, :, None]
    cols = jnp.arange(cap)[None, None, None, :]
    pre_mask4 = cache["mask"][:, None, None, :] & (cols <= rows)
    # prefill returns HIDDEN states; the vocab head runs only on the last
    # position — a full-prompt head is B*L*V fp (7.8 GB at B=32, L=1024,
    # V=128k: the long-context prefill OOM) and all but one row is discarded
    hid, cache = decoder.forward(
        params, cfg, input_embeds.astype(cfg.jnp_dtype), positions,
        pre_mask4, cache, impl=impl, return_hidden=True)
    last_logits = decoder.head_logits(
        params, cfg, hid[:, -1:])[:, 0].astype(jnp.float32)  # left-pad: last is real

    last_pos = positions[:, -1]

    def cond(state):
        step, done, *_ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, done, cur_logits, cache, key, out, tail, nwritten = state
        nxt, new_done, key, out, tail, nwritten = advance_sampling(
            step, done, cur_logits, key, out, tail, nwritten,
            temperature=temperature, top_p=top_p, pad_token_id=pad_token_id,
            eos_token_id=eos_token_id, stop_sequences=stop_sequences,
            tail_len=tail_len)

        emb = decoder.embed_tokens(params, nxt)[:, None].astype(cfg.jnp_dtype)
        pos = (last_pos + 1 + step)[:, None]
        slot = l + step
        cache["mask"] = jax.lax.dynamic_update_slice(
            cache["mask"], ~done[:, None], (0, slot))
        step_mask4 = cache["mask"][:, None, None, :]
        lg, cache = decoder.forward(params, cfg, emb, pos, step_mask4, cache,
                                    impl=impl)
        return (step + 1, new_done, lg[:, 0].astype(jnp.float32), cache, key,
                out, tail, nwritten)

    out0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
    tail0 = jnp.full((b, max(tail_len, 1)), -1, jnp.int32)
    state = (jnp.int32(0), jnp.zeros((b,), bool), last_logits, cache, rng,
             out0, tail0, jnp.zeros((b,), jnp.int32))
    step, done, _, _, _, out, _, nwritten = jax.lax.while_loop(
        cond, body, state)
    # lengths = tokens actually generated per row (counting the terminal
    # EOS/stop token); robust to the pad id being a sampleable vocab token
    return GenerateOutput(out, nwritten)


NEG_INF = -1.0e9   # HF beam search's masking constant (generation/utils.py)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_beams", "max_new_tokens", "eos_token_id",
                     "pad_token_id", "length_penalty", "impl",
                     "quantize_cache"))
def beam_generate(params, cfg: DecoderConfig, input_embeds, attn_mask,
                  positions, *, num_beams: int, max_new_tokens: int,
                  eos_token_id: int = -1, pad_token_id: int = 0,
                  length_penalty: float = 1.0, quantize_cache=False,
                  impl: str = "auto") -> GenerateOutput:
    """Beam search over left-padded prompt embeddings (the reference's
    --num_beams surface, run_opus_ddp.py:156-158 -> HF generate).

    Mirrors transformers' static-shaped `_beam_search`
    (generation/utils.py `_get_top_k_continuations` /
    `_get_running_beams_for_next_iteration` / `_update_finished_beams` /
    `_check_early_stop_heuristic`) with do_sample=False and the default
    early_stopping=False, as one jitted prefill + lax.while_loop:
    2*num_beams candidates per step, finished hypotheses only from the top
    num_beams ranks, sum-logprob scores normalized by generated length **
    length_penalty, and the can-still-improve stopping heuristic.

    Returns the best finished hypothesis per batch row (tokens incl. the
    terminal EOS, padded with pad_token_id; lengths count the EOS).
    """
    k = num_beams
    k2 = 2 * k
    b, l, h = input_embeds.shape
    v = cfg.vocab_size
    # same capacity rounding as generate(): prefill takes the Pallas flash
    # path when the prompt shape qualifies (beam/MCQ prefill previously
    # always fell back to the XLA path)
    cap = cache_capacity(cfg, l, max_new_tokens)

    # prefill once on B rows, then tile everything to B*K beam rows
    cache = decoder.init_cache(cfg, b, cap, dtype=cfg.jnp_dtype,
                               stacked="layers_stacked" in params,
                               quantize=quantize_cache)
    cache["mask"] = cache["mask"].at[:, :l].set(attn_mask)
    rows = jnp.arange(l)[None, None, :, None]
    cols = jnp.arange(cap)[None, None, None, :]
    pre_mask4 = cache["mask"][:, None, None, :] & (cols <= rows)
    # head on the last position only (see generate(): full-prompt logits
    # are B*L*V and get discarded)
    hid, cache = decoder.forward(
        params, cfg, input_embeds.astype(cfg.jnp_dtype), positions,
        pre_mask4, cache, impl=impl, return_hidden=True)
    last_logits = decoder.head_logits(params, cfg,
                                      hid[:, -1:])[:, 0].astype(jnp.float32)
    cache = decoder.tile_cache(cache, k)
    cur_logits = jnp.repeat(last_logits, k, axis=0)
    last_pos = jnp.repeat(positions[:, -1], k, axis=0)        # (B*K,)

    top_mask = jnp.arange(k2) < k                             # (2K,) ranks
    batch_off = (jnp.arange(b)[:, None] * k)                  # (B, 1)

    def gather_beams(x, idx):
        # x (B, K', ...) select along beam axis by idx (B, Kout)
        idxe = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, idxe.astype(jnp.int32), axis=1)

    def cond(st):
        gen_i, _, _, _, run_sc, _, fin_sc, fin_done, improve_ok, all_hit = st[:10]
        return ((gen_i < max_new_tokens) & jnp.any(improve_ok) & ~all_hit)

    def body(st):
        (gen_i, cur_logits, cache, run_seq, run_sc, fin_seq, fin_sc,
         fin_done, improve_ok, _, fin_len) = st
        logp = jax.nn.log_softmax(cur_logits, axis=-1)        # (B*K, V)
        cand = (logp.reshape(b, k, v) + run_sc[:, :, None]).reshape(b, k * v)
        topv, topi = jax.lax.top_k(cand, k2)                  # (B, 2K)
        tok = (topi % v).astype(jnp.int32)
        parent = topi // v                                    # (B, 2K)

        topk_seq = gather_beams(run_seq, parent)              # (B, 2K, max)
        topk_seq = jax.lax.dynamic_update_slice(
            topk_seq, tok[:, :, None], (0, 0, gen_i))

        hits = (tok == eos_token_id) | (gen_i + 1 >= max_new_tokens)

        # running beams for the next step: best K non-finished continuations
        run_cand = topv + hits.astype(jnp.float32) * NEG_INF
        _, idx2 = jax.lax.top_k(run_cand, k)                  # (B, K)
        new_run_sc = jnp.take_along_axis(run_cand, idx2, axis=1)
        new_run_seq = gather_beams(topk_seq, idx2)
        parent_sel = jnp.take_along_axis(parent, idx2, axis=1)

        # finished-hypothesis update (only top-K ranks may finish)
        fin_cand = topv / ((gen_i + 1).astype(jnp.float32) ** length_penalty)
        fin_gate = hits & top_mask[None, :] & improve_ok
        fin_cand = jnp.where(fin_gate, fin_cand, NEG_INF)
        m_sc = jnp.concatenate([fin_sc, fin_cand], axis=1)    # (B, 3K)
        m_seq = jnp.concatenate([fin_seq, topk_seq], axis=1)
        m_done = jnp.concatenate([fin_done, fin_gate], axis=1)
        m_len = jnp.concatenate(
            [fin_len, jnp.broadcast_to(gen_i + 1, (b, k2))], axis=1)
        _, idx3 = jax.lax.top_k(m_sc, k)
        new_fin_sc = jnp.take_along_axis(m_sc, idx3, axis=1)
        new_fin_seq = gather_beams(m_seq, idx3)
        new_fin_done = jnp.take_along_axis(m_done, idx3, axis=1)
        new_fin_len = jnp.take_along_axis(m_len, idx3, axis=1)

        # each surviving beam inherits its parent's KV history
        flat_parent = (parent_sel + batch_off).reshape(-1)    # (B*K,)
        cache2 = decoder.reorder_cache(cache, flat_parent)
        nxt = jax.lax.dynamic_slice_in_dim(
            new_run_seq, gen_i, 1, axis=2)[:, :, 0].reshape(-1)   # (B*K,)
        emb = decoder.embed_tokens(params, nxt)[:, None].astype(cfg.jnp_dtype)
        pos = (last_pos + 1 + gen_i)[:, None]
        cache2["mask"] = jax.lax.dynamic_update_slice(
            cache2["mask"], jnp.ones((b * k, 1), bool), (0, l + gen_i))
        lg, cache2 = decoder.forward(params, cfg, emb, pos,
                                     cache2["mask"][:, None, None, :],
                                     cache2, impl=impl)

        # can any running beam still beat the worst finished hypothesis?
        best_possible = (new_run_sc[:, :1]
                         / ((gen_i + 1).astype(jnp.float32) ** length_penalty))
        worst_fin = jnp.where(new_fin_done,
                              jnp.min(new_fin_sc, axis=1, keepdims=True),
                              NEG_INF)
        new_improve = improve_ok & jnp.any(best_possible > worst_fin,
                                           axis=-1, keepdims=True)
        return (gen_i + 1, lg[:, 0].astype(jnp.float32), cache2, new_run_seq,
                new_run_sc, new_fin_seq, new_fin_sc, new_fin_done,
                new_improve, jnp.all(hits), new_fin_len)

    run_seq0 = jnp.full((b, k, max_new_tokens), pad_token_id, jnp.int32)
    run_sc0 = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG_INF
                        ).astype(jnp.float32).repeat(b, axis=0)
    st = (jnp.int32(0), cur_logits, cache, run_seq0, run_sc0,
          run_seq0, jnp.full((b, k), NEG_INF, jnp.float32),
          jnp.zeros((b, k), bool), jnp.ones((b, 1), bool),
          jnp.asarray(False), jnp.zeros((b, k), jnp.int32))
    st = jax.lax.while_loop(cond, body, st)
    fin_seq, fin_len = st[5], st[10]
    return GenerateOutput(fin_seq[:, 0], fin_len[:, 0])

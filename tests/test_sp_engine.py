"""Sequence-sharded generation (infer/sp_engine.py) vs engine.generate:
token-identical greedy output with the KV cache split over the virtual
("seq",) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine, sp_engine
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.parallel import ring


def _setup(family="llama", b=2, l=13, seed=0, stacked=False):
    cfg = DecoderConfig.tiny(family)
    params = decoder.init(jax.random.PRNGKey(seed), cfg)
    if stacked:
        params = decoder.stack_params(params)
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.vocab_size, (b, l)).astype(np.int32)
    mask = np.ones((b, l), bool)
    mask[1, :4] = False                   # row 1 left-padded shorter
    ids[1, :4] = 0
    emb = decoder.embed_tokens(params, jnp.asarray(ids))
    mask = jnp.asarray(mask)
    pos = decoder.positions_from_mask(mask)
    return cfg, params, emb, mask, pos


@pytest.mark.parametrize("n_seq,stacked", [(2, False), (4, True)])
def test_sp_generate_matches_single_device_greedy(n_seq, stacked):
    cfg, params, emb, mask, pos = _setup(stacked=stacked)
    kw = dict(max_new_tokens=10, temperature=0.0, eos_token_id=-1)
    ref = engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(1), **kw)
    got = sp_engine.generate_seq_sharded(params, cfg, emb, mask, pos,
                                         jax.random.PRNGKey(1),
                                         mesh=ring.make_sp_mesh(n_seq), **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(got.lengths))


def test_sp_generate_eos_and_stop_sequences():
    """EOS early-exit and stop-sequence suffixes behave as in
    engine.generate (same replicated loop logic)."""
    cfg, params, emb, mask, pos = _setup(l=9, seed=3)
    mesh = ring.make_sp_mesh(2)
    ref = engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(1), max_new_tokens=12,
                          temperature=0.0, eos_token_id=-1)
    first = int(np.asarray(ref.tokens)[0, 0])
    # stop on the very first generated token of row 0
    stops = engine.make_stop_sequences([[first]])
    got = sp_engine.generate_seq_sharded(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(1),
        mesh=mesh, max_new_tokens=12, temperature=0.0, eos_token_id=-1,
        stop_sequences=stops)
    ref_s = engine.generate(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(1),
        max_new_tokens=12, temperature=0.0, eos_token_id=-1,
        stop_sequences=stops)
    np.testing.assert_array_equal(np.asarray(ref_s.tokens),
                                  np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref_s.lengths),
                                  np.asarray(got.lengths))


def test_sp_generate_sampled_runs_and_quantized_cache():
    """Temperature sampling + int8-quantized sharded cache: valid tokens,
    right lengths (sampling ties may legitimately differ across the
    reassociated softmax, so no token-identity assert here)."""
    cfg, params, emb, mask, pos = _setup(l=8, seed=5)
    got = sp_engine.generate_seq_sharded(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(2),
        mesh=ring.make_sp_mesh(2), max_new_tokens=6, temperature=0.7,
        top_p=0.9, eos_token_id=-1, quantize_cache="int8")
    toks = np.asarray(got.tokens)
    assert toks.shape == (2, 6)
    assert (toks >= 0).all() and (toks < cfg.vocab_size).all()
    assert (np.asarray(got.lengths) == 6).all()


def test_sp_generate_dynamic_ntk_matches_single_device():
    """use_dynamic_ntk active (context exceeds the trained window) + prompt
    length not a multiple of the shard count: the sharded engine must pin
    ntk_ctx to the UNsharded engine's derived context (engine.cache_capacity
    of the pre-padding length — which generate_seq_sharded now calls
    directly), or the RoPE bases diverge. Token equality on a tiny random
    model is a coarse check; the structural guard is the shared
    cache_capacity derivation."""
    import dataclasses
    cfg, params, emb, mask, pos = _setup(l=13, seed=7)
    cfg = dataclasses.replace(cfg, use_dynamic_ntk=True,
                              max_position_embeddings=16)
    kw = dict(max_new_tokens=16, temperature=0.0, eos_token_id=-1)
    ref = engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(1), **kw)
    got = sp_engine.generate_seq_sharded(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(1),
        mesh=ring.make_sp_mesh(4), **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))


def test_sp_generate_prompt_not_multiple_of_shards():
    """L=13 over 4 shards: the engine left-pads to 16 internally and the
    output still matches single-device greedy."""
    cfg, params, emb, mask, pos = _setup(l=13)
    ref = engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(1), max_new_tokens=8,
                          temperature=0.0, eos_token_id=-1)
    got = sp_engine.generate_seq_sharded(
        params, cfg, emb, mask, pos, jax.random.PRNGKey(1),
        mesh=ring.make_sp_mesh(4), max_new_tokens=8, temperature=0.0,
        eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(got.tokens))

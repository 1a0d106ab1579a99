"""Int8-quantized KV cache: decode stays close to the bf16 cache path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.models import decoder


@pytest.mark.parametrize("stacked", [False, True])
def test_quantized_cache_generate_close(stacked):
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    if stacked:
        params = decoder.stack_params(params)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size)) * 0.1
    mask = jnp.ones((2, 8), bool)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    g_full = engine.generate(params, cfg, emb, mask, pos,
                             jax.random.PRNGKey(0), max_new_tokens=6,
                             temperature=0.0, eos_token_id=-1)
    g_q = engine.generate(params, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                          max_new_tokens=6, temperature=0.0, eos_token_id=-1,
                          quantize_cache=True)
    # greedy paths agree at least on the first tokens (divergence after a
    # tie-flip is chaotic, not wrong)
    assert (np.asarray(g_full.tokens[:, 0]) == np.asarray(g_q.tokens[:, 0])).all()


def test_quantized_cache_prefill_logits_close():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    b, l, cap = 2, 8, 12
    emb = jax.random.normal(jax.random.PRNGKey(1), (b, l, cfg.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(l), (b, l))

    def prefill(quant):
        cache = decoder.init_cache(cfg, b, cap, quantize=quant)
        cache["mask"] = cache["mask"].at[:, :l].set(True)
        rows = jnp.arange(l)[None, None, :, None]
        cols = jnp.arange(cap)[None, None, None, :]
        m4 = cache["mask"][:, None, None, :] & (cols <= rows)
        lg, c2 = decoder.forward(params, cfg, emb, pos, m4, cache)
        assert int(c2["index"]) == l
        return lg

    lg_f = prefill(False)
    lg_q = prefill(True)
    pf = jax.nn.softmax(np.asarray(lg_f, np.float32), -1)
    pq = jax.nn.softmax(np.asarray(lg_q, np.float32), -1)
    assert np.abs(pf - pq).max() < 0.03


@pytest.mark.parametrize("stacked", [False, True])
def test_int4_cache_generate_close(stacked):
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    if stacked:
        params = decoder.stack_params(params)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size)) * 0.1
    mask = jnp.ones((2, 8), bool)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    g_full = engine.generate(params, cfg, emb, mask, pos,
                             jax.random.PRNGKey(0), max_new_tokens=6,
                             temperature=0.0, eos_token_id=-1)
    g_q = engine.generate(params, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                          max_new_tokens=6, temperature=0.0, eos_token_id=-1,
                          quantize_cache="int4")
    assert (np.asarray(g_full.tokens[:, 0]) == np.asarray(g_q.tokens[:, 0])).all()


def test_int4_cache_prefill_logits_close():
    cfg = DecoderConfig.tiny()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    b, l, cap = 2, 8, 12
    emb = jax.random.normal(jax.random.PRNGKey(1), (b, l, cfg.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(l), (b, l))

    def prefill(quant):
        cache = decoder.init_cache(cfg, b, cap, quantize=quant)
        cache["mask"] = cache["mask"].at[:, :l].set(True)
        rows = jnp.arange(l)[None, None, :, None]
        cols = jnp.arange(cap)[None, None, None, :]
        m4 = cache["mask"][:, None, None, :] & (cols <= rows)
        lg, c2 = decoder.forward(params, cfg, emb, pos, m4, cache)
        assert int(c2["index"]) == l
        return lg

    pf = jax.nn.softmax(np.asarray(prefill(False), np.float32), -1)
    p4 = jax.nn.softmax(np.asarray(prefill("int4"), np.float32), -1)
    # 4-bit cache: looser than int8's 0.03 but still probability-close
    assert np.abs(pf - p4).max() < 0.08


def test_int4_cache_per_row_serving_write():
    """The serving engine's per-row (B,)-indexed single-token write path
    must round-trip through the packed leaf."""
    cfg = DecoderConfig.tiny()
    b, cap = 2, 8
    cache = decoder.init_cache(cfg, b, cap, quantize="int4")
    lc = cache["layers"][0]
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.standard_normal(
        (b, 1, cfg.num_kv_heads, cfg.head_dim)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal(
        (b, 1, cfg.num_kv_heads, cfg.head_dim)), jnp.float32)
    idx = jnp.asarray([3, 5], jnp.int32)
    new = decoder._write_cache(lc, k_new, v_new, idx)
    deq = np.asarray(decoder._dequantize_kv(new["k"], jnp.float32))
    for i, slot in enumerate([3, 5]):
        got, want = deq[i, slot], np.asarray(k_new[i, 0])
        assert np.abs(got - want).max() < np.abs(want).max() / 7.0 + 1e-6

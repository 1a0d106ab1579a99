"""Chunked prefill (ServingEngine chunk_prefill=C): prompts longer than
the largest prefill bucket admit in C-token chunks, one chunk per tick,
interleaved with decode — token-identical at T=0 to an engine that
prefills the same prompt monolithically through a big bucket."""

import jax
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig(family="llama", vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_layers=2, num_heads=4,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    return cfg, decoder.init(jax.random.PRNGKey(0), cfg)


def _emb(cfg, seed, p):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((p, cfg.hidden_size)) * 0.3).astype(
        np.float32)


def _ref(params, cfg, reqs, bucket, **kw):
    """Monolithic-prefill reference: one bucket big enough for everything."""
    eng = ServingEngine(params, cfg, max_slots=4, max_len=128,
                        prefill_buckets=(bucket,), **kw)
    done = eng.run([ServeRequest(r.request_id, embeds=r.embeds,
                                 max_new_tokens=r.max_new_tokens,
                                 temperature=0.0) for r in reqs],
                   max_ticks=300)
    return {r.request_id: r.tokens for r in done.values()}


def test_chunked_long_prompt_matches_monolithic(setup):
    cfg, params = setup
    reqs = [ServeRequest("long", embeds=_emb(cfg, 0, 53),   # 53 = 3x16+5:
                         max_new_tokens=6, temperature=0.0)]  # partial tail
    ref = _ref(params, cfg, reqs, bucket=64)
    eng = ServingEngine(params, cfg, max_slots=2, max_len=128,
                        prefill_buckets=(16,), chunk_prefill=16)
    done = eng.run(list(reqs), max_ticks=300)
    assert done["long"].tokens == ref["long"]


def test_chunked_interleaves_with_decode(setup):
    """Short prompts admitted alongside a chunking long prompt keep
    decoding (ticks advance them) and everything matches the monolithic
    reference."""
    cfg, params = setup
    reqs = [ServeRequest("long", embeds=_emb(cfg, 1, 40),
                         max_new_tokens=5, temperature=0.0),
            ServeRequest("s1", embeds=_emb(cfg, 2, 7),
                         max_new_tokens=8, temperature=0.0),
            ServeRequest("s2", embeds=_emb(cfg, 3, 11),
                         max_new_tokens=6, temperature=0.0)]
    ref = _ref(params, cfg, reqs, bucket=64)
    eng = ServingEngine(params, cfg, max_slots=3, max_len=128,
                        prefill_buckets=(16,), chunk_prefill=16,
                        steps_per_tick=2)
    # drive manually to observe interleaving: the short prompts must
    # produce tokens BEFORE the long prompt finishes its chunks
    for r in reqs:
        eng.submit(r)
    done = {}
    saw_interleave = False
    ticks = 0
    while eng.busy and ticks < 300:
        for c in eng.step():
            done[c.request_id] = c
        if eng._chunking and any(len(t) > 1
                                 for t in (rs.tokens for rs in eng._slot_owner.values())):
            saw_interleave = True
        ticks += 1
    for rid, toks in ref.items():
        assert done[rid].tokens == toks, rid
    assert saw_interleave, "short prompts never decoded while the long " \
                           "prompt was still chunking"


def test_chunked_with_int8_cache(setup):
    cfg, params = setup
    reqs = [ServeRequest(0, embeds=_emb(cfg, 4, 37), max_new_tokens=5,
                         temperature=0.0)]
    ref = _ref(params, cfg, reqs, bucket=64, quantize_cache=True)
    eng = ServingEngine(params, cfg, max_slots=2, max_len=128,
                        prefill_buckets=(16,), chunk_prefill=16,
                        quantize_cache=True)
    done = eng.run(list(reqs), max_ticks=300)
    assert done[0].tokens == ref[0]


def test_chunked_cancel_mid_prefill(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_len=128,
                        prefill_buckets=(16,), chunk_prefill=16)
    eng.submit(ServeRequest("x", embeds=_emb(cfg, 5, 48),
                            max_new_tokens=50, temperature=0.0))
    eng.step()                      # admit + first chunk
    assert eng._chunking, "should still be chunking"
    assert eng.cancel("x")
    out = eng.step()
    assert not eng._chunking and not eng._slot_owner
    cancelled = [c for c in out if c.finish_reason == "cancelled"]
    assert cancelled and cancelled[0].tokens == []
    # the engine keeps serving
    done = eng.run([ServeRequest("y", embeds=_emb(cfg, 6, 9),
                                 max_new_tokens=4, temperature=0.0)],
                   max_ticks=100)
    assert len(done["y"].tokens) > 0


def test_long_prompt_rejected_without_chunking(setup):
    cfg, params = setup
    eng = ServingEngine(params, cfg, max_slots=2, max_len=128,
                        prefill_buckets=(16,))
    with pytest.raises(ValueError, match="chunk_prefill"):
        eng.submit(ServeRequest(0, embeds=_emb(cfg, 7, 40),
                                max_new_tokens=4))
    # and chunked engines still enforce total KV capacity
    eng2 = ServingEngine(params, cfg, max_slots=2, max_len=64,
                         prefill_buckets=(16,), chunk_prefill=16)
    with pytest.raises(ValueError, match="capacity"):
        eng2.submit(ServeRequest(0, embeds=_emb(cfg, 8, 60),
                                 max_new_tokens=20))

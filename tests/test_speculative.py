"""Speculative decoding: token identity with greedy generate regardless of
draft quality; acceptance only changes the verify-pass count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine, speculative
from opus_pllm_tpu.models import decoder


def _cfg(layers=2, seed_dims=(64, 128)):
    h, i = seed_dims
    return DecoderConfig(family="llama", vocab_size=128, hidden_size=h,
                         intermediate_size=i, num_layers=layers,
                         num_heads=4, num_kv_heads=2, head_dim=16,
                         dtype="float32")


def _prompt(cfg, b=2, l=7, seed=3):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), bool)
    # row 1 left-padded by 2 to exercise the padded-prompt path
    mask = mask.at[1, :2].set(False)
    pos = decoder.positions_from_mask(mask)
    return ids, mask, pos


def _ref(params, cfg, ids, mask, pos, max_new, eos=-1):
    emb = decoder.embed_tokens(params, ids)
    out = engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(0), max_new_tokens=max_new,
                          temperature=0.0, eos_token_id=eos, pad_token_id=0)
    return np.asarray(out.tokens), np.asarray(out.lengths)


def _spec(dparams, dcfg, params, cfg, ids, mask, pos, max_new, K, eos=-1):
    emb = decoder.embed_tokens(params, ids)
    demb = decoder.embed_tokens(dparams, ids)
    out = speculative._speculative(dparams, params, dcfg, cfg, emb, demb,
                                   mask, pos, max_new, K, eos, 0, False,
                                   0.0, 1.0, None, "auto")
    return np.asarray(out.tokens), np.asarray(out.lengths), int(out.iterations)


@pytest.mark.parametrize("K", [2, 4])
def test_perfect_draft_matches_generate_in_few_passes(K):
    """Draft == target: every proposal is accepted, so the output equals
    greedy generate and the verify-pass count is ~max_new/K instead of
    max_new (the whole point of speculation)."""
    cfg = _cfg()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    ids, mask, pos = _prompt(cfg)
    max_new = 12
    ref_t, ref_l = _ref(params, cfg, ids, mask, pos, max_new)
    t, l, iters = _spec(params, cfg, params, cfg, ids, mask, pos,
                        max_new, K)
    np.testing.assert_array_equal(t, ref_t)
    np.testing.assert_array_equal(l, ref_l)
    # 1 prefill token + iters passes of K accepted each
    assert iters <= -(-(max_new - 1) // K) + 1

def test_garbage_draft_still_token_identical():
    """A draft with unrelated random weights (near-zero acceptance) must
    not change a single output token — only the pass count grows."""
    cfg = _cfg()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    dcfg = _cfg(layers=1, seed_dims=(32, 64))       # smaller, different
    dparams = decoder.init(jax.random.PRNGKey(9), dcfg)
    ids, mask, pos = _prompt(cfg)
    max_new = 10
    ref_t, ref_l = _ref(params, cfg, ids, mask, pos, max_new)
    t, l, iters = _spec(dparams, dcfg, params, cfg, ids, mask, pos,
                        max_new, 4)
    np.testing.assert_array_equal(t, ref_t)
    np.testing.assert_array_equal(l, ref_l)
    assert iters <= max_new          # worst case: one token per pass


def test_eos_stops_rows_independently():
    """EOS emitted mid-chunk finishes that row; lengths match generate."""
    cfg = _cfg()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    ids, mask, pos = _prompt(cfg)
    max_new = 16
    # pick the token the target actually emits early so EOS fires mid-run
    ref_t, _ = _ref(params, cfg, ids, mask, pos, max_new)
    eos = int(ref_t[0, 3])
    ref_t, ref_l = _ref(params, cfg, ids, mask, pos, max_new, eos=eos)
    t, l, _ = _spec(params, cfg, params, cfg, ids, mask, pos, max_new, 4,
                    eos=eos)
    np.testing.assert_array_equal(t, ref_t)
    np.testing.assert_array_equal(l, ref_l)


def test_stacked_and_quantized_cache_paths():
    """Stacked-scan layout + int8 KV cache produce the same tokens."""
    cfg = _cfg()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    stacked = decoder.stack_params(jax.tree.map(lambda x: x, params))
    ids, mask, pos = _prompt(cfg)
    max_new = 8
    ref_t, ref_l = _ref(params, cfg, ids, mask, pos, max_new)
    emb = decoder.embed_tokens(stacked, ids)
    out = speculative._speculative(stacked, params, cfg, cfg, emb, emb,
                                   mask, pos, max_new, 3, -1, 0, True,
                                   0.0, 1.0, None, "auto")
    # int8 KV quantization perturbs logits; tokens may legitimately differ
    # from the bf16-cache reference on random weights — only check shape
    # discipline and that the run completes finite
    assert np.asarray(out.tokens).shape == ref_t.shape
    assert int(out.iterations) >= 1
    assert np.all(np.asarray(out.lengths) <= max_new)


def test_draft_from_target_layouts():
    """Layer-skip draft: first-n layers in both layouts, shared
    embed/norm/head; invalid n rejected."""
    import pytest

    from opus_pllm_tpu.core.config import DecoderConfig
    from opus_pllm_tpu.models import decoder

    cfg = DecoderConfig.tiny("llama")
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    dp, dcfg = speculative.draft_from_target(params, cfg, 1)
    assert dcfg.num_layers == 1 and len(dp["layers"]) == 1
    assert dp["embed_tokens"] is params["embed_tokens"]   # shared, no copy
    assert dp["layers"][0] is params["layers"][0]

    stacked = decoder.stack_params(
        {k: v for k, v in params.items()})
    dp2, dcfg2 = speculative.draft_from_target(stacked, cfg, 1)
    leaf = jax.tree.leaves(dp2["layers_stacked"])[0]
    assert leaf.shape[0] == 1 and dcfg2.num_layers == 1

    for bad in (0, cfg.num_layers, 5):
        with pytest.raises(ValueError, match="draft_layers"):
            speculative.draft_from_target(params, cfg, bad)


def test_sampled_statistical_equivalence_static():
    """speculative_generate at T>0 (rejection-verified speculative
    sampling, batch-min truncated acceptance) must match plain
    engine.generate's per-position token marginals — the draft only
    affects speed. Deterministic key streams; thresholds sit ~2x above
    the empirical-vs-empirical sampling noise at this sample count."""
    cfg = DecoderConfig(family="llama", vocab_size=32, hidden_size=32,
                        intermediate_size=64, num_layers=3, num_heads=2,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    params = decoder.init(jax.random.PRNGKey(4), cfg)
    dparams, dcfg = speculative.draft_from_target(params, cfg, 1)
    b, l, new = 16, 6, 4
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (b, l)), jnp.int32)
    mask = jnp.ones((b, l), bool)
    pos = decoder.positions_from_mask(mask)
    emb = decoder.embed_tokens(params, ids)

    kw = dict(max_new_tokens=new, temperature=0.6, top_p=0.9,
              eos_token_id=-1, pad_token_id=0)
    plain, spec = [], []
    for rep in range(80):
        key = jax.random.PRNGKey(5000 + rep)
        o1 = engine.generate(params, cfg, emb, mask, pos, key, **kw)
        o2 = speculative.speculative_generate(
            dparams, params, dcfg, cfg, emb, emb, mask, pos,
            n_draft=3, rng=key, **kw)
        plain.append(np.asarray(o1.tokens))
        spec.append(np.asarray(o2.tokens))
    plain = np.concatenate(plain)       # (80*b, new)
    spec = np.concatenate(spec)
    for j in range(new):
        ha = np.bincount(plain[:, j], minlength=cfg.vocab_size) / len(plain)
        hb = np.bincount(spec[:, j], minlength=cfg.vocab_size) / len(spec)
        assert 0.5 * np.abs(ha - hb).sum() < 0.11, j


def test_runner_self_speculative_token_identical(tmp_path):
    """run_annotation_eval with gen.draft_layers produces the exact same
    result file as plain greedy — speculative decoding only changes
    speed, reachable via --draft-layers."""
    import json

    from opus_pllm_tpu.core.config import GenerationConfig, OpusConfig
    from opus_pllm_tpu.evals import runner
    from opus_pllm_tpu.infer.tokenization import ByteTokenizer
    from opus_pllm_tpu.models import opus

    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    data = [{"instruction": "What is the subcellular localization?",
             "input": "MKTAYIAKQR" * (i + 1), "output": "Nucleus"}
            for i in range(3)]
    path = tmp_path / "test_localization.json"
    path.write_text(json.dumps(data))

    def run(draft_layers):
        gen = GenerationConfig(max_new_tokens=8, temperature=0.0,
                               eos_token_id=tok.eos_token_id,
                               pad_token_id=tok.pad_token_id,
                               draft_layers=draft_layers, n_draft=3)
        return runner.run_annotation_eval(
            params, cfg, tok, str(path), gen=gen, batch_size=2,
            prompt_bucket=32, esm_bucket=32, log_fn=lambda *_: None).results

    assert run(1) == run(0)


def test_make_draft_validates():
    import pytest

    from opus_pllm_tpu.core.config import GenerationConfig, OpusConfig
    from opus_pllm_tpu.evals import runner
    from opus_pllm_tpu.models import opus

    cfg = OpusConfig.tiny("llama")
    params = opus.init(jax.random.PRNGKey(0), cfg)
    assert runner.make_draft(params, cfg, GenerationConfig()) is None
    # sampled decoding is allowed (rejection-verified speculative sampling)
    assert runner.make_draft(
        params, cfg,
        GenerationConfig(temperature=0.5, draft_layers=1)) is not None
    with pytest.raises(ValueError, match="beam"):
        runner.make_draft(params, cfg,
                          GenerationConfig(temperature=0.0, num_beams=2,
                                           draft_layers=1))

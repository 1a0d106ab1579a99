"""Decoder parity vs HF Llama/Qwen2/OPT (random tiny weights, converted),
plus KV-cache consistency: decode step-by-step == full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.core.convert import decoder_from_hf
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.models.layers import causal_mask


def _hf_tiny(family):
    import torch
    torch.manual_seed(0)
    if family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=16, rms_norm_eps=1e-5,
                          rope_theta=500000.0, max_position_embeddings=512,
                          tie_word_embeddings=False, attention_bias=False,
                          attention_dropout=0.0)
        return LlamaForCausalLM(cfg).eval()
    if family == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(vocab_size=256, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, rms_norm_eps=1e-5,
                          rope_theta=500000.0, max_position_embeddings=512,
                          tie_word_embeddings=False, attention_dropout=0.0)
        return Qwen2ForCausalLM(cfg).eval()
    if family == "opt":
        from transformers import OPTConfig, OPTForCausalLM
        cfg = OPTConfig(vocab_size=256, hidden_size=64, ffn_dim=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=512, do_layer_norm_before=True,
                        activation_function="relu", dropout=0.0,
                        word_embed_proj_dim=64, tie_word_embeddings=True)
        return OPTForCausalLM(cfg).eval()
    raise ValueError(family)


def _ours_cfg(family):
    # qwen2 HF tiny derives head_dim = hidden/num_heads = 16
    return DecoderConfig.tiny(family)


@pytest.mark.parametrize("family", ["llama", "qwen2", "opt"])
def test_parity_vs_hf(family):
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(family)
    cfg = _ours_cfg(family)
    params = decoder_from_hf(hf.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    B, S = 2, 12
    ids = rng.integers(3, 250, size=(B, S))
    am = np.ones((B, S), dtype=np.int64)
    am[1, :4] = 0  # left-padded second sample

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(am))
        ref = out.logits.float().numpy()

    embeds = decoder.embed_tokens(params, jnp.asarray(ids))
    positions = decoder.positions_from_mask(jnp.asarray(am, bool))
    mask4 = causal_mask(jnp.asarray(am, bool))
    logits, _ = decoder.forward(params, cfg, embeds, positions, mask4)
    ours = np.asarray(logits)

    valid = am.astype(bool)[..., None]
    np.testing.assert_allclose(np.where(valid, ours, 0),
                               np.where(valid, ref, 0), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("family", ["llama", "opt"])
def test_kv_cache_matches_full_forward(family):
    cfg = _ours_cfg(family)
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, S, CAP = 2, 10, 16
    ids = jnp.asarray(rng.integers(3, 250, size=(B, S)))
    am = np.ones((B, S), dtype=bool)
    am[1, :3] = False
    am_j = jnp.asarray(am)

    embeds = decoder.embed_tokens(params, ids)
    positions = decoder.positions_from_mask(am_j)

    # full forward
    full_logits, _ = decoder.forward(params, cfg, embeds, positions,
                                     causal_mask(am_j))

    # prefill first 6 tokens into cache, then decode one at a time
    cache = decoder.init_cache(cfg, B, CAP, dtype=jnp.float32)
    P = 6
    cache["mask"] = cache["mask"].at[:, :P].set(am_j[:, :P])
    pre_mask4 = (cache["mask"][:, None, None, :] &
                 (jnp.arange(CAP)[None, None, None, :] <= jnp.arange(P)[None, None, :, None]))
    pre_logits, cache = decoder.forward(params, cfg, embeds[:, :P],
                                        positions[:, :P], pre_mask4, cache)
    valid = np.asarray(am)[:, :P, None]  # padding rows are garbage by design
    np.testing.assert_allclose(np.asarray(pre_logits) * valid,
                               np.asarray(full_logits[:, :P]) * valid,
                               rtol=2e-4, atol=2e-4)

    for t in range(P, S):
        cache["mask"] = cache["mask"].at[:, t].set(am_j[:, t])
        step_mask4 = cache["mask"][:, None, None, :]
        lg, cache = decoder.forward(params, cfg, embeds[:, t:t + 1],
                                    positions[:, t:t + 1], step_mask4, cache)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_dynamic_ntk_rope_scaling():
    """use_dynamic_ntk rescales the rotary base only past the trained
    window (builder.py:93-94's flag, made a real feature)."""
    from opus_pllm_tpu.models.layers import ntk_scaled_theta

    # inside the window: untouched
    assert ntk_scaled_theta(1e6, 128, 512, 2048) == 1e6
    # past the window: theta * s**(d/(d-2))
    got = ntk_scaled_theta(1e6, 128, 4096, 2048)
    assert got == pytest.approx(1e6 * 2.0 ** (128 / 126))

    # e2e: identical logits inside the window, different past it
    cfg = DecoderConfig.tiny()
    base = decoder.init(jax.random.PRNGKey(0), cfg)
    ntk = type(cfg)(**{**cfg.__dict__, "use_dynamic_ntk": True,
                       "max_position_embeddings": 8})
    s_in, s_out = 8, 16
    for s, should_match in ((s_in, True), (s_out, False)):
        emb = jax.random.normal(jax.random.PRNGKey(1),
                                (1, s, cfg.hidden_size)) * 0.1
        mask = jnp.ones((1, s), bool)
        pos = jnp.broadcast_to(jnp.arange(s), (1, s))
        m4 = causal_mask(mask)
        a, _ = decoder.forward(base, cfg, emb, pos, m4)
        b, _ = decoder.forward(base, ntk, emb, pos, m4)
        same = bool(jnp.allclose(a, b, atol=1e-5))
        assert same == should_match, (s, same)

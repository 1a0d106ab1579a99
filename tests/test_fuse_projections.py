"""decoder.fuse_projections: fused qkv/gateup == unfused, all weight forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.kernels import quant, quant4
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.models.layers import causal_mask


def _cfg(family="llama"):
    return DecoderConfig(
        family=family, vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=64, max_position_embeddings=512,
        dtype="float32", attention_bias=(family == "qwen2"))


def _inputs(cfg, b=2, s=6):
    emb = jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.hidden_size)) * 0.1
    mask = jnp.ones((b, s), bool)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    return emb, pos, causal_mask(mask)


@pytest.mark.parametrize("family", ["llama", "qwen2"])
def test_fused_matches_unfused_bf16(family):
    cfg = _cfg(family)
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    fused = decoder.fuse_projections(params, cfg)
    assert "qkv_proj" in fused["layers"][0]
    assert "gateup_proj" in fused["layers"][0]
    assert "q_proj" not in fused["layers"][0]
    emb, pos, m4 = _inputs(cfg)
    a, _ = decoder.forward(params, cfg, emb, pos, m4)
    b_, _ = decoder.forward(fused, cfg, emb, pos, m4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_unfused_int8():
    cfg = _cfg()
    params = quant.quantize_decoder(decoder.init(jax.random.PRNGKey(0), cfg))
    fused = decoder.fuse_projections(params, cfg)
    assert "kernel_q" in fused["layers"][0]["qkv_proj"]
    emb, pos, m4 = _inputs(cfg)
    a, _ = decoder.forward(params, cfg, emb, pos, m4)
    b_, _ = decoder.forward(fused, cfg, emb, pos, m4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=1e-4, atol=1e-4)


def test_fused_matches_unfused_int4():
    cfg = _cfg()
    params = quant4.quantize_decoder4(decoder.init(jax.random.PRNGKey(0), cfg))
    fused = decoder.fuse_projections(params, cfg)
    assert "kernel_p" in fused["layers"][0]["qkv_proj"]
    assert fused["layers"][0]["qkv_proj"]["gscale"].shape == (2, 512)
    emb, pos, m4 = _inputs(cfg)
    a, _ = decoder.forward(params, cfg, emb, pos, m4)
    b_, _ = decoder.forward(fused, cfg, emb, pos, m4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=1e-4, atol=1e-4)


def test_fused_lora_deltas_on_slices():
    from opus_pllm_tpu.core.config import LoRAConfig
    from opus_pllm_tpu.lora import lora

    cfg = _cfg()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    tree = lora.init(jax.random.PRNGKey(2), cfg, lcfg)
    # non-zero B so deltas actually bite
    tree = jax.tree.map(lambda x: x + 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), x.shape), tree)
    fused = decoder.fuse_projections(params, cfg)
    emb, pos, m4 = _inputs(cfg)
    a, _ = decoder.forward(params, cfg, emb, pos, m4, lora=tree,
                           lora_scale=lora.scaling(lcfg))
    b_, _ = decoder.forward(fused, cfg, emb, pos, m4, lora=tree,
                            lora_scale=lora.scaling(lcfg))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=1e-4, atol=1e-4)


def test_fused_generate_with_cache():
    from opus_pllm_tpu.infer import engine

    cfg = _cfg()
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    fused = decoder.fuse_projections(params, cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.hidden_size)) * 0.1
    msk = jnp.ones((1, 5), bool)
    pos = jnp.broadcast_to(jnp.arange(5), (1, 5))
    kw = dict(max_new_tokens=4, temperature=0.0, eos_token_id=-1,
              pad_token_id=0)
    a = engine.generate(params, cfg, emb, msk, pos, jax.random.PRNGKey(2), **kw)
    b_ = engine.generate(fused, cfg, emb, msk, pos, jax.random.PRNGKey(2), **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b_.tokens))

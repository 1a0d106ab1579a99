"""Text encoder + alternative CSTP adapters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.bridge import adapters
from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.models import decoder, text_encoder


@pytest.mark.parametrize("family", ["llama", "opt"])
def test_text_embeddings_shapes(family):
    cfg = DecoderConfig.tiny(family)
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), bool).at[1, 7:].set(False)
    emb = text_encoder.text_embeddings(params, cfg, ids, mask)
    assert emb.shape == (2, cfg.hidden_size)
    assert emb.dtype == jnp.float32
    emb_m = text_encoder.text_embeddings(params, cfg, ids, mask, mask_pad=True)
    # masked mean differs from the reference's pad-inclusive mean
    assert not np.allclose(np.asarray(emb), np.asarray(emb_m))


def test_text_embeddings_matches_hf_hidden_state_semantics():
    """first+last hidden mean == HF (hidden_states[0] + hidden_states[-1])."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from opus_pllm_tpu.core import convert

    cfg = DecoderConfig.tiny("llama")
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps, attention_bias=False,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = convert.decoder_from_hf(
        {k: v for k, v in hf.state_dict().items()}, cfg, jnp.float32)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 8))
    with torch.no_grad():
        out = hf(torch.tensor(ids), output_hidden_states=True)
    golden = (out.hidden_states[0] + out.hidden_states[-1]).mean(1).numpy()
    ours = text_encoder.text_embeddings(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones((2, 8), bool))
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-4, atol=2e-4)


def test_adapter_stack_shapes_and_grads():
    d, heads = 64, 4
    p = adapters.adapter_stack_init(jax.random.PRNGKey(0), d, n_layers=2)
    seq = jax.random.normal(jax.random.PRNGKey(1), (3, d))
    txt = jax.random.normal(jax.random.PRNGKey(2), (3, d))
    out = adapters.adapter_stack(p, seq, txt, num_heads=heads)
    assert out.shape == (3, d)
    g = jax.grad(lambda pp: jnp.sum(
        adapters.adapter_stack(pp, seq, txt, num_heads=heads) ** 2))(p)
    assert float(jnp.abs(g["layers"][0]["mha"]["w_q"]["kernel"]).max()) > 0


def test_residual_text_projection_alpha():
    p = adapters.residual_text_projection_init(jax.random.PRNGKey(0), 16, 32)
    f = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    out0 = adapters.residual_text_projection(p, f, alpha=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(f), atol=1e-6)
    out8 = adapters.residual_text_projection(p, f, alpha=0.8)
    assert not np.allclose(np.asarray(out8), np.asarray(f))


def test_relu_adapter_dropout():
    p = adapters.relu_adapter_init(jax.random.PRNGKey(0), 8, 12)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    det = adapters.relu_adapter(p, x)          # no rng -> deterministic
    assert det.shape == (4, 12) and (np.asarray(det) >= 0).all()
    drop = adapters.relu_adapter(p, x, rng=jax.random.PRNGKey(2))
    assert (np.asarray(drop) == 0).sum() >= (np.asarray(det) == 0).sum()

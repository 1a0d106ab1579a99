"""Stacked-layer lax.scan decoder path == unrolled path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig, LoRAConfig
from opus_pllm_tpu.infer import engine
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.models.layers import causal_mask


@pytest.fixture(params=["llama", "opt", "qwen2"])
def setup(request):
    cfg = DecoderConfig.tiny(request.param)
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.hidden_size)) * 0.1
    mask = jnp.ones((2, 6), bool)
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    return cfg, params, emb, pos, causal_mask(mask)


def test_stack_unstack_roundtrip(setup):
    cfg, params, *_ = setup
    stacked = decoder.stack_params(params)
    assert "layers" not in stacked
    back = decoder.unstack_params(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, back)


def test_scan_forward_matches_unrolled(setup):
    cfg, params, emb, pos, m4 = setup
    lg_list, _ = decoder.forward(params, cfg, emb, pos, m4)
    lg_scan, _ = decoder.forward(decoder.stack_params(params), cfg, emb,
                                 pos, m4)
    np.testing.assert_allclose(np.asarray(lg_list), np.asarray(lg_scan),
                               rtol=1e-5, atol=1e-5)


def test_scan_generate_matches_unrolled(setup):
    cfg, params, emb, pos, m4 = setup
    mask = jnp.ones((2, 6), bool)
    g1 = engine.generate(params, cfg, emb, mask, pos, jax.random.PRNGKey(0),
                         max_new_tokens=5, temperature=0.0, eos_token_id=-1)
    g2 = engine.generate(decoder.stack_params(params), cfg, emb, mask, pos,
                         jax.random.PRNGKey(0), max_new_tokens=5,
                         temperature=0.0, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(g1.tokens), np.asarray(g2.tokens))


def test_scan_with_lora_and_remat_grads():
    cfg = DecoderConfig.tiny()
    lcfg = LoRAConfig(rank=2)
    params = decoder.stack_params(decoder.init(jax.random.PRNGKey(0), cfg))
    tree = lora_mod.init(jax.random.PRNGKey(1), cfg, lcfg)
    tree = jax.tree.map(lambda x: x + 0.01, tree)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 6, cfg.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    m4 = causal_mask(jnp.ones((2, 6), bool))

    def loss(t, remat):
        lg, _ = decoder.forward(params, cfg, emb, pos, m4, lora=t,
                                lora_scale=2.0, remat=remat)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda t: loss(t, False))(tree)
    l1, g1 = jax.value_and_grad(lambda t: loss(t, True))(tree)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7), g0, g1)
    assert float(jnp.abs(g0["layers"][0]["q_proj"]["A"]).max()) > 0


def test_esm2_fused_qkv_equivalence():
    from opus_pllm_tpu.core.config import ESM2Config
    from opus_pllm_tpu.models import esm2

    cfg = ESM2Config.tiny()
    p = esm2.init(jax.random.PRNGKey(0), cfg)
    toks, _ = esm2.tokenize(["MKTAYIAK", "ACD"])
    a = esm2.encode(p, cfg, jnp.asarray(toks))
    b = esm2.encode(esm2.fuse_qkv(p), cfg, jnp.asarray(toks))
    c = esm2.encode(esm2.fuse_qkv(esm2.stack_params(p)), cfg,
                    jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5,
                               atol=1e-5)


def test_stacked_partition_specs():
    from jax.sharding import PartitionSpec as P

    from opus_pllm_tpu.parallel import partition

    cfg = DecoderConfig.tiny()
    params = decoder.stack_params(decoder.init(jax.random.PRNGKey(0), cfg))
    specs = partition.specs(params)
    assert specs["layers_stacked"]["q_proj"]["kernel"] == \
        P(None, "data", "model")
    assert specs["layers_stacked"]["o_proj"]["kernel"] == \
        P(None, "model", "data")
    assert specs["embed_tokens"]["embedding"] == P(None, "data")


def test_index_scan_matches_xs_scan():
    """scan_mode="index" (dynamic-slice per layer — bounds the stacked-weight
    relayout to one layer, the single-chip >3B OOM fix) must be numerically
    identical to the xs scan and the unrolled loop, with and without cache
    and LoRA."""
    from opus_pllm_tpu.lora import lora as lora_mod
    from opus_pllm_tpu.core.config import LoRAConfig
    from opus_pllm_tpu.models.layers import causal_mask

    cfg = DecoderConfig.tiny()
    base = decoder.init(jax.random.PRNGKey(0), cfg)
    stacked = decoder.stack_params(base)
    lcfg = LoRAConfig(rank=2)
    lora = lora_mod.init(jax.random.PRNGKey(1), cfg, lcfg)
    lora = jax.tree.map(lambda x: x + 0.01, lora)   # nonzero B
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 8, cfg.hidden_size),
                            jnp.float32) * 0.3
    mask = jnp.ones((2, 8), bool)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    m4 = causal_mask(mask)

    lg_un, _ = decoder.forward(base, cfg, emb, pos, m4, lora=lora)
    lg_xs, _ = decoder.forward(stacked, cfg, emb, pos, m4, lora=lora)
    lg_ix, _ = decoder.forward(stacked, cfg, emb, pos, m4, lora=lora,
                               scan_mode="index")
    np.testing.assert_allclose(np.asarray(lg_ix), np.asarray(lg_xs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lg_ix), np.asarray(lg_un),
                               rtol=2e-4, atol=2e-4)

    # with KV cache (decode path) + remat (train path)
    cache = decoder.init_cache(cfg, 2, 16, dtype=jnp.float32, stacked=True)
    cache["mask"] = cache["mask"].at[:, :8].set(True)
    rows = jnp.arange(8)[None, None, :, None]
    cols = jnp.arange(16)[None, None, None, :]
    m4c = cache["mask"][:, None, None, :] & (cols <= rows)
    lg1, c1 = decoder.forward(stacked, cfg, emb, pos, m4c, cache)
    lg2, c2 = decoder.forward(stacked, cfg, emb, pos, m4c, cache,
                              scan_mode="index")
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(c1), jax.tree.leaves(c2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)

    def loss(p, mode):
        lg, _ = decoder.forward(p, cfg, emb, pos, m4, remat=True,
                                scan_mode=mode)
        return jnp.sum(lg.astype(jnp.float32) ** 2) * 1e-4

    g_xs = jax.grad(loss)(stacked, "xs")
    g_ix = jax.grad(loss)(stacked, "index")
    for a, b in zip(jax.tree.leaves(g_xs), jax.tree.leaves(g_ix)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

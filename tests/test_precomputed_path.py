"""Precomputed-embedding training path, remat equivalence, residue embeds."""

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import (ESM2Config, IGNORE_INDEX, OpusConfig,
                                       SEQ_TOKEN_INDEX)
from opus_pllm_tpu.models import decoder, esm2, opus
from opus_pllm_tpu.models.layers import causal_mask


def test_pooled_emb_matches_esm_tower():
    cfg = OpusConfig.tiny()
    params = opus.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.llm.vocab_size, (2, 10)).astype(np.int32)
    ids[:, 1] = SEQ_TOKEN_INDEX
    mask = jnp.ones((2, 10), bool)
    esm_t = rng.integers(4, 24, (2, 1, 8)).astype(np.int32)
    esm_t[:, :, 0] = 0
    esm_t[:, :, -1] = 2
    # offline precompute then inject
    pooled = esm2.pooled_embedding(params["esm"], cfg.esm,
                                   jnp.asarray(esm_t[:, 0]))[:, None, :]
    lg_online, _ = opus.forward(params, cfg, jnp.asarray(ids), mask,
                                jnp.asarray(esm_t))
    lg_offline, _ = opus.forward(params, cfg, jnp.asarray(ids), mask,
                                 pooled_emb=pooled)
    np.testing.assert_allclose(np.asarray(lg_online), np.asarray(lg_offline),
                               rtol=1e-4, atol=1e-4)


def test_collate_emits_pooled_emb():
    from opus_pllm_tpu.data.collate import collate_instruction_batch
    from opus_pllm_tpu.infer.tokenization import ByteTokenizer

    tok = ByteTokenizer()
    exs = [{"instruction": "x", "sequence": "MKT", "output": "y",
            "seq_embedding": np.ones(16, np.float32)}]
    b = collate_instruction_batch(exs, tok, prompt_bucket=16, esm_bucket=16)
    assert "pooled_emb" in b and "esm_tokens" not in b
    assert b["pooled_emb"].shape == (1, 1, 16)


def test_remat_forward_and_grads_match():
    cfg = OpusConfig.tiny().llm
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.hidden_size))
    mask = jnp.ones((2, 8), bool)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    m4 = causal_mask(mask)

    def loss(p, remat):
        lg, _ = decoder.forward(p, cfg, emb, pos, m4, remat=remat)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6), g0, g1)


def test_residue_embeddings():
    cfg = ESM2Config.tiny()
    params = esm2.init(jax.random.PRNGKey(0), cfg)
    toks, _ = esm2.tokenize(["ACDEF", "KL"])
    reps, residue = esm2.residue_embeddings(params, cfg, jnp.asarray(toks))
    assert reps.shape == (2, 7, cfg.embed_dim)
    np.testing.assert_array_equal(
        np.asarray(residue),
        [[False, True, True, True, True, True, False],
         [False, True, True, False, False, False, False]])
    # pooled == masked mean of residue embeddings
    pooled = esm2.pooled_embedding(params, cfg, jnp.asarray(toks))
    manual = (np.asarray(reps) * np.asarray(residue)[..., None]).sum(1) / \
        np.asarray(residue).sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(pooled), manual, rtol=2e-5,
                               atol=2e-5)

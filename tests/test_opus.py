"""Full multimodal assembly: splice semantics + loss + trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import (IGNORE_INDEX, OpusConfig,
                                       SEQ_TOKEN_INDEX)
from opus_pllm_tpu.models import opus


def _batch(cfg, b=2, l=16, l_aa=10, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.llm.vocab_size, (b, l)).astype(np.int32)
    ids[:, 2] = SEQ_TOKEN_INDEX
    mask = np.ones((b, l), bool)
    mask[1, -3:] = False          # ragged sample
    ids[1, -3:] = 0
    labels = ids.copy()
    labels[:, :5] = IGNORE_INDEX
    esm = rng.integers(4, 24, (b, 1, l_aa)).astype(np.int32)
    esm[:, :, 0] = 0
    esm[:, :, -1] = 2
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(esm),
            jnp.asarray(labels))


def test_forward_shapes_and_protein_rows():
    cfg = OpusConfig.tiny()
    params = opus.init(jax.random.PRNGKey(0), cfg)
    ids, mask, esm, labels = _batch(cfg)
    logits, sp = opus.forward(params, cfg, ids, mask, esm, labels)
    n = cfg.switch.n_tokens
    l_out = ids.shape[1] + cfg.max_proteins_per_prompt * (n - 1)
    assert logits.shape == (2, l_out, cfg.llm.vocab_size)
    # protein soft tokens occupy positions 2..2+n with IGNORE labels
    assert np.all(np.asarray(sp.labels)[0, 2:2 + n] == IGNORE_INDEX)
    # soft tokens present: embedding at sentinel != text embedding row
    soft = opus.encode_proteins(params, cfg, esm)
    np.testing.assert_allclose(np.asarray(sp.embeds)[0, 2:2 + n],
                               np.asarray(soft)[0, 0].astype(sp.embeds.dtype),
                               rtol=1e-5, atol=1e-5)


def test_loss_finite_and_grads_flow_to_all_parts():
    cfg = OpusConfig.tiny()
    params = opus.init(jax.random.PRNGKey(0), cfg)
    ids, mask, esm, labels = _batch(cfg)

    def lf(p):
        logits, sp = opus.forward(p, cfg, ids, mask, esm, labels)
        return opus.next_token_loss(logits, sp.labels, sp.mask)

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    # the protein path gets gradient signal through the splice
    g_switch = np.abs(np.asarray(grads["switch"]["layers"][0]["kernel"])).max()
    g_esm = np.abs(np.asarray(
        grads["esm"]["layers"][0]["q_proj"]["kernel"])).max()
    assert g_switch > 0
    assert g_esm > 0


def test_two_proteins_per_prompt():
    import dataclasses

    cfg = dataclasses.replace(OpusConfig.tiny(), max_proteins_per_prompt=2)
    params = opus.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, l = 2, 14
    ids = rng.integers(4, cfg.llm.vocab_size, (b, l)).astype(np.int32)
    ids[:, 2] = SEQ_TOKEN_INDEX
    ids[:, 9] = SEQ_TOKEN_INDEX
    mask = jnp.ones((b, l), bool)
    esm = rng.integers(4, 24, (b, 2, 8)).astype(np.int32)
    esm[:, :, 0] = 0
    esm[:, :, -1] = 2
    logits, sp = opus.forward(params, cfg, jnp.asarray(ids), mask,
                              jnp.asarray(esm))
    n = cfg.switch.n_tokens
    assert logits.shape[1] == l + 2 * (n - 1)
    soft = opus.encode_proteins(params, cfg, jnp.asarray(esm))
    # first sentinel -> protein 0, second -> protein 1 (in order)
    np.testing.assert_allclose(
        np.asarray(sp.embeds)[0, 2:2 + n],
        np.asarray(soft)[0, 0].astype(sp.embeds.dtype), rtol=1e-5, atol=1e-5)
    second_start = 9 + (n - 1)   # shifted by first expansion
    np.testing.assert_allclose(
        np.asarray(sp.embeds)[0, second_start:second_start + n],
        np.asarray(soft)[0, 1].astype(sp.embeds.dtype), rtol=1e-5, atol=1e-5)


def test_left_pad_forward_alignment():
    cfg = OpusConfig.tiny()
    params = opus.init(jax.random.PRNGKey(0), cfg)
    ids, mask, esm, labels = _batch(cfg)
    _, sp = opus.forward(params, cfg, ids, mask, esm, left_pad=True)
    m = np.asarray(sp.mask)
    # left-pad: all valid slots flush right
    for i in range(m.shape[0]):
        first = np.argmax(m[i])
        assert m[i, first:].all()
        assert not m[i, :first].any()

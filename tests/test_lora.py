"""LoRA adapter tree: no-op at init, unmerged == merged forward."""

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import DecoderConfig, LoRAConfig
from opus_pllm_tpu.lora import lora
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.models.layers import causal_mask


def _setup(family="llama"):
    cfg = DecoderConfig.tiny(family)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    tree = lora.init(jax.random.PRNGKey(1), cfg, lcfg)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 6, cfg.hidden_size))
    mask = jnp.ones((2, 6), bool)
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))
    return cfg, lcfg, params, tree, emb, pos, causal_mask(mask)


def test_zero_init_is_noop():
    cfg, lcfg, params, tree, emb, pos, m4 = _setup()
    base, _ = decoder.forward(params, cfg, emb, pos, m4)
    with_lora, _ = decoder.forward(params, cfg, emb, pos, m4, lora=tree,
                                   lora_scale=lora.scaling(lcfg))
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               rtol=1e-6, atol=1e-6)


def test_unmerged_matches_merged():
    cfg, lcfg, params, tree, emb, pos, m4 = _setup()
    # random nonzero B so the adapter actually does something
    tree = jax.tree.map(lambda x: x + 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), x.shape), tree)
    unmerged, _ = decoder.forward(params, cfg, emb, pos, m4, lora=tree,
                                  lora_scale=lora.scaling(lcfg))
    merged_params = lora.merge(params, tree, lcfg)
    merged, _ = decoder.forward(merged_params, cfg, emb, pos, m4)
    np.testing.assert_allclose(np.asarray(unmerged), np.asarray(merged),
                               rtol=2e-4, atol=2e-4)


def test_peft_roundtrip_matches_merge():
    """lora_from_peft -> merge_lora_into_decoder == lora.merge."""
    from opus_pllm_tpu.core import convert

    cfg, lcfg, params, tree, *_ = _setup()
    tree = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(4), x.shape),
        tree)
    # serialize our tree into PEFT-style torch keys
    sd = {}
    for i, lp in enumerate(tree["layers"]):
        for proj, ab in lp.items():
            where = "self_attn" if proj.endswith(("q_proj", "k_proj", "v_proj", "o_proj")) else "mlp"
            base = f"base_model.model.model.layers.{i}.{where}.{proj}"
            sd[f"{base}.lora_A.weight"] = np.asarray(ab["A"]).T  # torch (out,in)
            sd[f"{base}.lora_B.weight"] = np.asarray(ab["B"]).T
    peft_tree = convert.lora_from_peft(sd)
    m1 = convert.merge_lora_into_decoder(params, peft_tree, lora.scaling(lcfg))
    m2 = lora.merge(params, tree, lcfg)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), m1, m2)

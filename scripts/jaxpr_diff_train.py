"""Dump a primitive-count summary of the stage-(c/d) train step jaxpr for a
given repo checkout: python /tmp/jaxpr_train.py <repo> <out>."""
import collections
import sys

repo, out = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

from opus_pllm_tpu.core.config import (CSTPConfig, DecoderConfig, ESM2Config,
                                       IGNORE_INDEX, LoRAConfig, OpusConfig,
                                       SEQ_TOKEN_INDEX, SwitchProjectorConfig,
                                       TrainConfig)
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.train import multimodal_trainer as mmt

llm = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                    intermediate_size=5632, num_layers=22, num_heads=16,
                    num_kv_heads=4, head_dim=128, dtype="bfloat16")
esm = ESM2Config.t12_35M()
esm = type(esm)(**{**esm.__dict__, "dtype": "bfloat16"})
batch, seq, l_aa = 8, 512, 256

cfg = OpusConfig(
    esm=esm,
    cstp=CSTPConfig(protein_dim=esm.embed_dim, text_dim=llm.hidden_size,
                    proj_dim=llm.hidden_size),
    switch=SwitchProjectorConfig(input_dim=llm.hidden_size,
                                 llm_hidden_size=llm.hidden_size, n_tokens=8),
    llm=llm, max_prompt_len=seq)
lcfg = LoRAConfig(rank=16)
params = jax.eval_shape(lambda k: opus.init(k, cfg), jax.random.PRNGKey(0))
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg,
                             TrainConfig(learning_rate=1e-4), params,
                             train_switch=True, lora_cfg=lcfg)
step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg, donate=False)

rng = np.random.default_rng(2)
ids = rng.integers(4, llm.vocab_size, (batch, seq)).astype(np.int32)
ids[:, 1] = SEQ_TOKEN_INDEX
labels = ids.copy()
labels[:, :16] = IGNORE_INDEX
esm_toks = rng.integers(4, 24, (batch, 1, l_aa)).astype(np.int32)
esm_toks[:, :, 0], esm_toks[:, :, -1] = 0, 2
batch_d = {"input_ids": jnp.asarray(ids),
           "attn_mask": jnp.ones((batch, seq), bool),
           "labels": jnp.asarray(labels),
           "esm_tokens": jnp.asarray(esm_toks)}

jaxpr = jax.make_jaxpr(lambda s, f, b: step.__wrapped__(s, f, b)
                       if hasattr(step, "__wrapped__") else step(s, f, b)
                       )(state, params, batch_d)


def walk(jx, counts, depth=0):
    for eq in jx.eqns:
        counts[eq.primitive.name] += 1
        for k, v in eq.params.items():
            if hasattr(v, "eqns"):
                walk(v, counts, depth + 1)
            elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                walk(v.jaxpr, counts, depth + 1)
            elif isinstance(v, (list, tuple)):
                for it in v:
                    if hasattr(it, "eqns"):
                        walk(it, counts, depth + 1)
                    elif hasattr(it, "jaxpr"):
                        walk(it.jaxpr, counts, depth + 1)


counts = collections.Counter()
walk(jaxpr.jaxpr, counts)
with open(out, "w") as f:
    for name, n in sorted(counts.items()):
        f.write(f"{name} {n}\n")
print("wrote", out, "total", sum(counts.values()))

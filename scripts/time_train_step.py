"""Time the stage-(c/d) 1.1B train step against an arbitrary repo checkout.

Usage: python /tmp/time_train.py /path/to/repo [label]
Two-point chain timing (t_3N - t_N)/2N, same protocol as bench.py HEAD.
"""
import sys, time
repo = sys.argv[1]
label = sys.argv[2] if len(sys.argv) > 2 else repo
sys.path.insert(0, repo)

import jax, jax.numpy as jnp, numpy as np
print("jax up", jax.default_backend(), flush=True)

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
batch, seq, l_aa, steps, rank = 8, 512, 256, 5, 16

cfg = OpusConfig(
    esm=esm,
    cstp=CSTPConfig(protein_dim=esm.embed_dim, text_dim=llm.hidden_size,
                    proj_dim=llm.hidden_size),
    switch=SwitchProjectorConfig(input_dim=llm.hidden_size,
                                 llm_hidden_size=llm.hidden_size, n_tokens=8),
    llm=llm, max_prompt_len=seq)
lcfg = LoRAConfig(rank=rank)
print("building params", flush=True)
params = opus.init(jax.random.PRNGKey(0), cfg)
print("params done", flush=True)
state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg,
                             TrainConfig(learning_rate=1e-4), params,
                             train_switch=True, lora_cfg=lcfg)
step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg)

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

t0 = time.perf_counter()
state, m = step(state, params, batch_d)
print(f"[{label}] loss0={float(m['loss']):.4f} "
      f"compile={time.perf_counter()-t0:.1f}s", flush=True)


def run_chain(n):
    global state
    t0 = time.perf_counter()
    for _ in range(n):
        state, mm = step(state, params, batch_d)
    assert np.isfinite(float(mm["loss"]))
    return time.perf_counter() - t0


for rep in range(3):
    t_a = run_chain(steps)
    t_b = run_chain(3 * steps)
    st = max((t_b - t_a) / (2 * steps), 1e-9)
    print(f"[{label}] rep{rep}: {st*1e3:.1f} ms/step "
          f"{batch*seq/st:.0f} tok/s", flush=True)

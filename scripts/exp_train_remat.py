"""stage-(c/d) 1.1B train step: remat policy A/B on the real chip.

The step trains ONLY switch+LoRA (the base is frozen), so the backward
pass skips every frozen-weight grad — full per-layer remat then pays a
whole extra forward to save activation memory the 16 GB chip may not
even need at batch 8 x seq 512. Variants:
  full  — jax.checkpoint per layer (the round-1..4 default)
  dots  — checkpoint_dots policy: dot outputs saved, only elementwise
          recomputes (skips the remat forward's matmuls)
  none  — no remat (fastest if activations fit)
Two-point chain timing (t_3N - t_N)/2N, same protocol as bench.py.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import (CSTPConfig, DecoderConfig, ESM2Config,
                                       IGNORE_INDEX, LoRAConfig, OpusConfig,
                                       SEQ_TOKEN_INDEX,
                                       SwitchProjectorConfig, TrainConfig)
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.train import multimodal_trainer as mmt

from opus_pllm_tpu.core.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

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
                                 llm_hidden_size=llm.hidden_size,
                                 n_tokens=8),
    llm=llm, max_prompt_len=seq)
lcfg = LoRAConfig(rank=rank)
params = opus.init(jax.random.PRNGKey(0), cfg)

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

for name, remat in (("full", True), ("dots", "dots"), ("none", False)):
    state, tx = mmt.create_state(jax.random.PRNGKey(1), cfg,
                                 TrainConfig(learning_rate=1e-4), params,
                                 train_switch=True, lora_cfg=lcfg)
    step = mmt.make_train_step(cfg, tx, lora_cfg=lcfg, remat=remat)
    try:
        state, m = step(state, params, batch_d)
        l0 = float(m["loss"])
    except Exception as e:  # noqa: BLE001 — OOM is an expected outcome
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        continue

    def run_chain(n):
        global state
        t0 = time.perf_counter()
        for _ in range(n):
            state, mm = step(state, params, batch_d)
        assert np.isfinite(float(mm["loss"]))
        return time.perf_counter() - t0

    t_a = run_chain(steps)
    t_b = run_chain(3 * steps)
    st = max((t_b - t_a) / (2 * steps), 1e-9)
    print(f"{name}: {batch * seq / st:.0f} tok/s ({st * 1e3:.1f} ms/step, "
          f"loss0 {l0:.3f})", flush=True)
    del state, step
print("done", flush=True)

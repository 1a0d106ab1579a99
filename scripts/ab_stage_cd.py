"""Same-session A/B of the stage-(c/d) 1.1B train step across revisions.

Usage: python scripts/ab_stage_cd.py --path <repo-root> [--steps N]

Imports opus_pllm_tpu from --path (e.g. a `git worktree` of the round-1
commit vs HEAD), builds the exact bench.py `bench_train` 1.1B config, and
prints a two-point-timed step time — the protocol that cancels tunnel/
dispatch constants (BENCH_NOTES.md). Run both revisions back to back in
one session; the pair settles whether round 1's 16.9k tok/s baseline was
a faster binary or a favorable tunnel phase (round-2 verdict weak #1).
Uses only APIs present since round 1 (make_train_step(cfg, tx, lora_cfg)).
"""
import argparse
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--path", required=True)
ap.add_argument("--steps", type=int, default=5)
args = ap.parse_args()
sys.path.insert(0, args.path)

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import (CSTPConfig, DecoderConfig, ESM2Config,
                                       IGNORE_INDEX, LoRAConfig, OpusConfig,
                                       SEQ_TOKEN_INDEX, SwitchProjectorConfig,
                                       TrainConfig)
from opus_pllm_tpu.models import opus
from opus_pllm_tpu.train import multimodal_trainer as mmt

print(f"path={args.path} backend={jax.default_backend()}", flush=True)

llm = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                    intermediate_size=5632, num_layers=22, num_heads=16,
                    num_kv_heads=4, head_dim=128, dtype="bfloat16")
esm = ESM2Config.t12_35M()
esm = type(esm)(**{**esm.__dict__, "dtype": "bfloat16"})
batch, seq, l_aa, rank = 8, 512, 256, 16
steps = args.steps

cfg = OpusConfig(
    esm=esm,
    cstp=CSTPConfig(protein_dim=esm.embed_dim, text_dim=llm.hidden_size,
                    proj_dim=llm.hidden_size),
    switch=SwitchProjectorConfig(input_dim=llm.hidden_size,
                                 llm_hidden_size=llm.hidden_size, n_tokens=8),
    llm=llm, max_prompt_len=seq)
lcfg = LoRAConfig(rank=rank)
params = opus.init(jax.random.PRNGKey(0), cfg)
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
print(f"compile+step1 {time.perf_counter()-t0:.1f}s loss={float(m['loss']):.4f}",
      flush=True)


def run_chain(n):
    global state
    t0 = time.perf_counter()
    for _ in range(n):
        state, mm = step(state, params, batch_d)
    loss = float(mm["loss"])
    assert np.isfinite(loss)
    return time.perf_counter() - t0


t_a = run_chain(steps)
t_b = run_chain(3 * steps)
step_time = (t_b - t_a) / (2 * steps)
print(f"two-point step_time={step_time*1e3:.1f} ms  "
      f"tok/s={batch*seq/step_time:.0f}  (t_N={t_a:.2f}s t_3N={t_b:.2f}s)",
      flush=True)

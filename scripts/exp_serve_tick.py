"""Isolate the serving decode tick's per-step cost vs static generate.

The round-4 profile (exp_serve_profile.py) shows decode-only serving ticks
at ~127 ms where the static per-tick equivalent is ~90-116 ms — AFTER the
fetch round trip is pipelined away. This measures, two-point style:
  1. static generate pure decode step (t(new=128) - t(new=32)) / 96
  2. serving decode tick with 8 busy slots, no admissions, chained
  3. (2) again with max_len equal to static's cache cap (isolates KV width)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine as gen_engine
from opus_pllm_tpu.models import decoder as dec
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine

print("backend:", jax.default_backend(), flush=True)
cfg = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                    intermediate_size=5632, num_layers=22, num_heads=16,
                    num_kv_heads=4, head_dim=128, dtype="bfloat16")
p, slots, spt = 64, 8, 32
params = dec.init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)

emb = jnp.asarray(rng.standard_normal((slots, p, cfg.hidden_size)) * 0.3,
                  cfg.jnp_dtype)
mask = jnp.ones((slots, p), bool)
pos = jnp.broadcast_to(jnp.arange(p), (slots, p))


def time_static(new):
    kw = dict(max_new_tokens=new, temperature=0.0, eos_token_id=-1,
              pad_token_id=0)
    out = gen_engine.generate(params, cfg, emb, mask, pos,
                              jax.random.PRNGKey(1), **kw)
    np.asarray(out.tokens)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen_engine.generate(params, cfg, emb, mask, pos,
                                  jax.random.PRNGKey(1), **kw)
        np.asarray(out.tokens)
        best = min(best, time.perf_counter() - t0)
    return best


t128, t32 = time_static(128), time_static(32)
per_step = (t128 - t32) / 96
print(f"static: t128={t128*1e3:.0f} ms t32={t32*1e3:.0f} ms "
      f"-> pure decode {per_step*1e3:.2f} ms/step "
      f"({slots/per_step:.0f} tok/s/stepwise)", flush=True)


def time_serving_ticks(max_len, n_ticks=None):
    eng = ServingEngine(params, cfg, max_slots=slots, max_len=max_len,
                        prefill_buckets=(p,), steps_per_tick=spt,
                        admit_min_free=slots)
    eng.warmup()
    # admit 8 requests with budgets filling the cache; time only ticks
    # that are certainly live (budget // spt minus the 2 settle ticks)
    budget = max_len - p - 1
    live = budget // spt if spt > 1 else budget
    n_ticks = n_ticks or max(live - 3, 1)
    reqs = [ServeRequest(i, embeds=(rng.standard_normal(
        (p, cfg.hidden_size)) * 0.3).astype(np.float32),
        max_new_tokens=budget, eos_token_id=-1)
        for i in range(slots)]
    for r in reqs:
        eng.submit(r)
    eng.step()          # admission + first tick
    eng.step()          # settle pipeline
    t0 = time.perf_counter()
    for _ in range(n_ticks):
        eng.step()
    eng._drain_pending()
    dt = time.perf_counter() - t0
    tick = dt / n_ticks
    print(f"serving max_len={max_len} spt={spt}: {tick*1e3:.1f} ms/tick over "
          f"{n_ticks} live ticks ({tick/spt*1e3:.2f} ms/step, "
          f"{slots*spt/tick:.0f} tok/s)", flush=True)
    return tick


time_serving_ticks(576)      # 511-token budget: 12 certainly-live ticks
time_serving_ticks(320)      # production cap: 4 live ticks
# K=1 variant to expose per-step overhead inside the scan
spt = 1
time_serving_ticks(576, n_ticks=128)

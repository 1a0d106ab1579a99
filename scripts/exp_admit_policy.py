"""Admission-policy curve on the real chip (round-4 verdict next #7).

Sweeps `admit_min_free` (the admission-wave size: how many slots must be
free before a prefill dispatches) over the bench serving workload and a
mixed-length variant, recording throughput and TTFT p50/p95 — so the
queue-latency vs throughput trade is a documented curve, not a fixed
constant. With no-drain admission (round-5), waves overlap the in-flight
decode ticks, so larger waves amortize prefill dispatches without the
old drain stall.

    python scripts/exp_admit_policy.py
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.models import decoder as dec
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine

from opus_pllm_tpu.core.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
print("backend:", jax.default_backend(), flush=True)
cfg = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                    intermediate_size=5632, num_layers=22, num_heads=16,
                    num_kv_heads=4, head_dim=128, dtype="bfloat16")  # ~1.1B
params = dec.init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
slots, p, spt = 8, 64, 32


def workload(kind: str, n_req: int):
    if kind == "uniform":          # the bench workload: same length/budget
        return [ServeRequest((kind, i), embeds=(rng.standard_normal(
            (p, cfg.hidden_size)) * 0.3).astype(np.float32),
            max_new_tokens=128, eos_token_id=-1) for i in range(n_req)]
    # mixed: staggered budgets so slots free at different times (the
    # continuous-batching case; uniform waves are the worst case)
    return [ServeRequest((kind, i), embeds=(rng.standard_normal(
        (p, cfg.hidden_size)) * 0.3).astype(np.float32),
        max_new_tokens=64 + 16 * (i % 8), eos_token_id=-1)
        for i in range(n_req)]


def _measure(kind: str, amf: int, label=True):
    eng = ServingEngine(params, cfg, max_slots=slots,
                        max_len=((p + 128 + 127) // 128) * 128,
                        prefill_buckets=(p,), steps_per_tick=spt,
                        admit_min_free=amf)
    eng.warmup()
    reqs = workload(kind, 32)
    t0 = time.perf_counter()
    done = eng.run(reqs)
    dt = time.perf_counter() - t0
    total = sum(len(c.tokens) for c in done.values())
    assert len(done) == 32
    if not label:
        return
    lat = eng.latency["ttft"]
    print(f"admit_min_free={amf}: {total / dt:6.0f} tok/s  "
          f"ttft p50={lat.percentile(0.5) * 1e3:6.0f} ms "
          f"p95={lat.percentile(0.95) * 1e3:6.0f} ms "
          f"(mean {lat.mean * 1e3:.0f} ms) "
          f"prefills={eng.counters['prefills']} "
          f"parked={eng.counters['parked']}", flush=True)


# discarded warm run: the process's first ~10 dispatches ride the tunnel
# ramp (~9 s of wall) and would poison whichever row runs first
_measure("uniform", 4, label=False)
print("warm run done", flush=True)
for kind in ("uniform", "mixed"):
    print(f"--- workload {kind} (32 reqs / {slots} slots, spt {spt}) ---",
          flush=True)
    for amf in (1, 2, 4, 8):
        _measure(kind, amf)
print("done", flush=True)

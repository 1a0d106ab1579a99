"""Where does the serving-vs-static gap go? (round-3 verdict weak #3)

Runs the exact bench_serve workload (1.1B bf16, 32 reqs, p64, new 128,
8 slots, steps_per_tick 32) with host-side instrumentation of the engine
loop: per-tick decode dispatch wall, token-fetch wall (the np.asarray
sync), prefill wall, and scheduler wall. Through a remote tunnel the
fetch carries the dispatch round trip, so fetch-share ~= tunnel-share.
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
from opus_pllm_tpu.serve import engine as serve_engine
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine

from opus_pllm_tpu.core.util import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
print("backend:", jax.default_backend(), flush=True)
cfg = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                    intermediate_size=5632, num_layers=22, num_heads=16,
                    num_kv_heads=4, head_dim=128, dtype="bfloat16")
n_req, p, new, slots, spt = 32, 64, 128, 8, 32
params = dec.init(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)

# static baseline
emb = jnp.asarray(rng.standard_normal((slots, p, cfg.hidden_size)) * 0.3,
                  cfg.jnp_dtype)
mask = jnp.ones((slots, p), bool)
pos = jnp.broadcast_to(jnp.arange(p), (slots, p))
kw = dict(max_new_tokens=new, temperature=0.0, eos_token_id=-1,
          pad_token_id=0)
out = gen_engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(1), **kw)
np.asarray(out.tokens)
t0 = time.perf_counter()
out = gen_engine.generate(params, cfg, emb, mask, pos,
                          jax.random.PRNGKey(1), **kw)
np.asarray(out.tokens)
static_dt = time.perf_counter() - t0
static_tps = slots * new / static_dt
print(f"static: {static_tps:.0f} tok/s ({static_dt*1e3:.0f} ms)", flush=True)

eng = ServingEngine(params, cfg, max_slots=slots,
                    max_len=((p + new + 127) // 128) * 128,
                    prefill_buckets=(p,), steps_per_tick=spt,
                    admit_min_free=slots // 2 or 1)
t0 = time.perf_counter()
eng.warmup()
print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

# instrument: wrap the compiled callables + np.asarray sync
tm = {"decode_dispatch": 0.0, "fetch": 0.0, "prefill": 0.0, "n_ticks": 0,
      "n_prefills": 0}
orig_decode = eng._decode
orig_prefills = dict(eng._prefills)


def timed_decode(*a, **k):
    t = time.perf_counter()
    r = orig_decode(*a, **k)
    tm["decode_dispatch"] += time.perf_counter() - t
    tm["n_ticks"] += 1
    return r


eng._decode = timed_decode
for key, fn in orig_prefills.items():
    def mk(fn):
        def timed(*a, **k):
            t = time.perf_counter()
            r = fn(*a, **k)
            # dispatch wall only: blocking here would re-serialize the
            # async admission this script exists to measure
            tm["prefill"] += time.perf_counter() - t
            tm["n_prefills"] += 1
            return r
        return timed
    eng._prefills[key] = mk(fn)

step_walls = []   # (wall, n_admitted_this_step)


def run_once(seed):
    eng.reseed(seed)
    reqs = [ServeRequest((seed, i), embeds=(rng.standard_normal(
        (p, cfg.hidden_size)) * 0.3).astype(np.float32),
        max_new_tokens=new, eos_token_id=-1) for i in range(n_req)]
    for r in reqs:
        eng.submit(r)
    t0 = time.perf_counter()
    done = {}
    while eng._queue or eng._slot_owner:
        q0 = len(eng._queue)
        ts = time.perf_counter()
        out = eng.step()
        step_walls.append((time.perf_counter() - ts, q0 - len(eng._queue)))
        for c in out:
            done[c.request_id] = c
    dt = time.perf_counter() - t0
    total = sum(len(c.tokens) for c in done.values())
    return total / dt, dt


# warm pass then measured pass (ADVICE r3: warm-then-measure discipline)
run_once(1)
for k in tm:
    tm[k] = 0
step_walls.clear()
tps, dt = run_once(2)
print(f"serving: {tps:.0f} tok/s ({dt*1e3:.0f} ms) ratio={tps/static_tps:.2f}",
      flush=True)
print(f"ticks={tm['n_ticks']} prefills={tm['n_prefills']}", flush=True)
print(f"decode step() wall (incl fetch inside step): "
      f"{tm['decode_dispatch']*1e3:.0f} ms", flush=True)
print(f"prefill wall: {tm['prefill']*1e3:.0f} ms", flush=True)
other = dt - tm["decode_dispatch"] - tm["prefill"]
print(f"other (sched + fetch): {other*1e3:.0f} ms", flush=True)
lat = eng.latency
print(f"ttft mean {lat['ttft'].mean*1e3:.0f} ms "
      f"(service {lat['service_ttft'].mean*1e3:.0f} ms + queue "
      f"{lat['queue_wait'].mean*1e3:.0f} ms), "
      f"duration mean {lat['duration'].mean*1e3:.0f} ms", flush=True)
dec_only = [w for w, a in step_walls if a == 0]
adm = [w for w, a in step_walls if a > 0]
print(f"decode-only steps: n={len(dec_only)} total={sum(dec_only)*1e3:.0f} ms"
      f" mean={np.mean(dec_only)*1e3:.1f} ms" if dec_only else "no dec-only",
      flush=True)
print(f"admission steps:   n={len(adm)} total={sum(adm)*1e3:.0f} ms"
      f" mean={np.mean(adm)*1e3:.1f} ms" if adm else "no admission steps",
      flush=True)
# device-side cost of one decode tick for comparison: K*step at b8
# ideal: new tokens per tick / static per-token time
ideal_tick = spt * static_dt / new
print(f"static per-tick-equivalent (spt {spt}): {ideal_tick*1e3:.1f} ms",
      flush=True)

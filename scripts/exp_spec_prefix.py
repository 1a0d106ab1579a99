"""TPU measurement: self-speculative decode + serving prefix caching.

The two round-3 features whose TPU numbers were blocked on the wedged
tunnel (ROADMAP "Round-3 still open"). Run standalone on the real chip:

    python scripts/exp_spec_prefix.py

1. **Self-speculative decode** (infer/speculative.py, CLI --draft-layers):
   measures greedy decode tok/s on a 1.1B-class llama for the plain
   engine vs speculative with a layer-skip draft, in TWO weight regimes:
   - "identity-layers" (o_proj/down_proj zeroed so every layer is a
     residual pass-through): draft == target greedy -> acceptance ~= 1,
     the mechanical CEILING of the verify pipeline;
   - "random": untrained weights, acceptance near chance -> the FLOOR.
   Real checkpoints land in between (layer-skip drafts on trained LLMs
   accept 60-80% in the literature); the pair brackets the feature.

2. **Serving prefix caching** (serve/engine.register_prefix, CLI
   --cache-system-prefix): 16 requests sharing a 384-token system prefix
   + 64-token unique suffix, served with the prefix pinned once vs
   re-prefilled per request. Reports wall time and engine-side TTFT.

Timings use the two-point chain protocol (BENCH_NOTES.md) where the op
is a single dispatch, so tunnel round-trip constants cancel.
"""
import json
import sys
import time

import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from opus_pllm_tpu.core.config import DecoderConfig
from opus_pllm_tpu.infer import engine as gen_engine
from opus_pllm_tpu.infer.speculative import (draft_from_target,
                                             speculative_generate)
from opus_pllm_tpu.models import decoder as dec
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine

print(f"backend={jax.default_backend()}", flush=True)
ON_TPU = jax.default_backend() == "tpu"

if ON_TPU:
    CFG = DecoderConfig(family="llama", vocab_size=32000, hidden_size=2048,
                        intermediate_size=5632, num_layers=22, num_heads=16,
                        num_kv_heads=4, head_dim=128, dtype="bfloat16")
    B, P, NEW, DRAFT_L, NDRAFT = 8, 64, 128, 6, 4
    PFX, SFX, NREQ, SLOTS, PNEW = 384, 64, 16, 8, 64
else:   # CPU smoke so the script itself stays testable
    CFG = DecoderConfig(family="llama", vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_layers=4, num_heads=4,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    B, P, NEW, DRAFT_L, NDRAFT = 2, 8, 16, 2, 4
    PFX, SFX, NREQ, SLOTS, PNEW = 32, 8, 4, 2, 8


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(float(value), 2),
                      "unit": unit}), flush=True)


def chain_time(fn, n=2):
    """Two-point chain timing: (t_{1+2n} - t_1) / 2n. Both timed blocks
    pay the same constant dispatch/fetch cost, so tunnel round-trip
    constants cancel (BENCH_NOTES.md protocol)."""
    out = fn(); np.asarray(out.tokens)          # warm: compile + settle
    t0 = time.perf_counter()
    out = fn(); np.asarray(out.tokens)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + 2 * n):
        out = fn()
    np.asarray(out.tokens)
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (2 * n), 1e-9), out


def identity_layers(params):
    """Zero every layer's output projections: residual stream passes
    through untouched, so a first-K-layers draft is EXACT."""
    import copy
    p = dict(params)
    if "layers_stacked" in p:
        ls = dict(p["layers_stacked"])
        for k in ("o_proj", "down_proj"):
            ls[k] = jax.tree.map(jnp.zeros_like, ls[k])
        p["layers_stacked"] = ls
    else:
        layers = []
        for layer in p["layers"]:
            layer = copy.copy(layer)
            for k in ("o_proj", "down_proj"):
                layer[k] = jax.tree.map(jnp.zeros_like, layer[k])
            layers.append(layer)
        p["layers"] = layers
    return p


rng = np.random.default_rng(0)
params = dec.init(jax.random.PRNGKey(0), CFG)
emb = jnp.asarray(rng.standard_normal((B, P, CFG.hidden_size)) * 0.3,
                  CFG.jnp_dtype)
mask = jnp.ones((B, P), bool)
pos = jnp.broadcast_to(jnp.arange(P), (B, P))
base_kw = dict(max_new_tokens=NEW, temperature=0.0, eos_token_id=-1,
               pad_token_id=0)

# ---- 1. speculative decode ------------------------------------------------
for regime, prm in (("random", params), ("identity", identity_layers(params))):
    dprm, dcfg = draft_from_target(prm, CFG, DRAFT_L)

    def base():
        return gen_engine.generate(prm, CFG, emb, mask, pos,
                                   jax.random.PRNGKey(1), **base_kw)

    def spec():
        return speculative_generate(dprm, prm, dcfg, CFG, emb, emb, mask,
                                    pos, max_new_tokens=NEW, n_draft=NDRAFT,
                                    eos_token_id=-1, pad_token_id=0)

    t_base, ob = chain_time(base)
    t_spec, os_ = chain_time(spec)
    if regime == "identity":   # draft exact -> outputs must match
        nb, ns = np.asarray(ob.tokens), np.asarray(os_.tokens)
        assert (nb == ns).all(), "identity-regime speculative mismatch"
    emit(f"spec_decode_{regime}_base_tok_per_sec", B * NEW / t_base,
         f"tokens/sec greedy engine b{B} (1.1B)" if ON_TPU else "cpu smoke")
    emit(f"spec_decode_{regime}_spec_tok_per_sec", B * NEW / t_spec,
         f"tokens/sec --draft-layers {DRAFT_L} n_draft {NDRAFT}")
    emit(f"spec_decode_{regime}_speedup", t_base / t_spec, "ratio")

# ---- 2. serving prefix caching --------------------------------------------
prefix = (rng.standard_normal((PFX, CFG.hidden_size)) * 0.3).astype(np.float32)
sufs = [(rng.standard_normal((SFX, CFG.hidden_size)) * 0.3).astype(np.float32)
        for _ in range(NREQ)]
full_len = PFX + SFX
cap = ((full_len + PNEW + 127) // 128) * 128

for label, use_prefix in (("off", False), ("on", True)):
    # one bucket per engine: each variant admits exactly one prompt shape,
    # and every extra bucket costs remote-service compiles at warmup
    eng = ServingEngine(params, CFG, max_slots=SLOTS, max_len=cap,
                        prefill_buckets=(SFX if use_prefix else full_len,),
                        steps_per_tick=16, admit_min_free=SLOTS // 2 or 1)
    if use_prefix:
        eng.register_prefix("sys", embeds=prefix)
    eng.warmup()
    if use_prefix:
        reqs = [ServeRequest(i, embeds=sufs[i], prefix_id="sys",
                             max_new_tokens=PNEW, eos_token_id=-1)
                for i in range(NREQ)]
    else:
        reqs = [ServeRequest(i, embeds=np.concatenate([prefix, sufs[i]]),
                             max_new_tokens=PNEW, eos_token_id=-1)
                for i in range(NREQ)]
    # warm pass first (first-tick compiles + scheduling noise), measure the
    # second — the same warm-then-measure discipline as the speculative
    # section above; engines are reusable after run()
    eng.run([ServeRequest(10_000 + r.request_id, embeds=r.embeds,
                          prefix_id=r.prefix_id,
                          max_new_tokens=r.max_new_tokens,
                          eos_token_id=-1) for r in reqs])
    t0 = time.perf_counter()
    done = eng.run(reqs)
    dt = time.perf_counter() - t0
    assert len(done) == NREQ
    tot = sum(len(c.tokens) for c in done.values())
    emit(f"serve_prefix_{label}_tok_per_sec", tot / dt,
         f"tokens/sec {NREQ} reqs sharing {PFX}-tok prefix, "
         f"{SFX}-tok suffixes")
    lat = eng.latency
    if lat["ttft"].count:
        emit(f"serve_prefix_{label}_ttft_mean_ms", lat["ttft"].mean * 1e3,
             "ms engine-side")

print("done", flush=True)

"""Randomized serving-engine stress test: a seeded mix of staggered
admissions, mid-flight cancellations, per-request adapters, a pinned
prefix, and chunked long prompts — every completed request must be
token-identical to its one-shot reference, and the engine must end with
zero leaked state. The piecewise invariants are each locked by their own
test files; this drives them TOGETHER, the way live traffic does."""

import jax
import numpy as np
import pytest

from opus_pllm_tpu.core.config import DecoderConfig, LoRAConfig
from opus_pllm_tpu.lora import lora as lora_mod
from opus_pllm_tpu.models import decoder
from opus_pllm_tpu.serve.engine import ServeRequest, ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig(family="llama", vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_layers=2, num_heads=4,
                        num_kv_heads=2, head_dim=16, dtype="float32")
    params = decoder.init(jax.random.PRNGKey(0), cfg)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    adapters = {}
    for i, name in enumerate(("loc", "go")):
        t = lora_mod.init(jax.random.PRNGKey(10 + i), cfg, lcfg)
        t = jax.tree.map(
            lambda x: x if x.shape[-1] == lcfg.rank else
            0.3 * jax.random.normal(jax.random.PRNGKey(20 + i), x.shape),
            t)
        adapters[name] = t
    return cfg, params, lcfg, adapters


def _emb(cfg, seed, p):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((p, cfg.hidden_size)) * 0.3).astype(
        np.float32)


def _oneshot(params, cfg, emb, max_new, prefix_emb=None):
    """Per-request reference: a fresh 1-slot engine (token-identity with
    infer.engine.generate is locked in test_serve.py; here the reference
    just has to be independent of the fuzzed engine's scheduling)."""
    eng = ServingEngine(params, cfg, max_slots=1, max_len=128,
                        prefill_buckets=(16, 32, 64), chunk_prefill=16)
    kw = {}
    if prefix_emb is not None:
        eng.register_prefix("p", embeds=prefix_emb)
        kw["prefix_id"] = "p"
    done = eng.run([ServeRequest(0, embeds=emb, max_new_tokens=max_new,
                                 temperature=0.0, **kw)], max_ticks=400)
    return done[0].tokens


@pytest.mark.parametrize("spec", [False, True], ids=["plain", "spec"])
def test_fuzz_mixed_traffic_token_identical(setup, spec):
    """spec=True runs the same storm through the self-speculative engine
    (draft_layers=1): greedy traffic must stay token-identical under
    variable per-row acceptance interleaved with admissions/cancels."""
    cfg, params, lcfg, adapters = setup
    s = lora_mod.scaling(lcfg)
    rng = np.random.default_rng(42)

    merged = {name: lora_mod.merge(params, t, lcfg)
              for name, t in adapters.items()}
    prefix_emb = _emb(cfg, 999, 12)

    # 14 requests: random lengths (some past the largest bucket -> the
    # chunked-prefill path), random budgets, a third under an adapter,
    # a few on the pinned prefix, three cancelled mid-flight
    plan = []
    for i in range(14):
        p = int(rng.integers(4, 60))
        budget = int(rng.integers(3, 11))
        adapter = (None, "loc", "go")[int(rng.integers(0, 3))]
        use_prefix = adapter is None and bool(rng.integers(0, 2))
        plan.append(dict(rid=i, p=p, budget=budget, adapter=adapter,
                         prefix=use_prefix, emb=_emb(cfg, i, p)))
    cancel_at = {2: 1, 7: 3, 11: 5}    # rid -> cancel after N ticks alive

    eng = ServingEngine(params, cfg, max_slots=4, max_len=160,
                        prefill_buckets=(16, 32, 64), steps_per_tick=2,
                        lora_bank=adapters, lora_scale=s,
                        chunk_prefill=16, adapter_capacity=3,
                        draft_layers=1 if spec else None, spec_k=3)
    eng.register_prefix("sys", embeds=prefix_emb)

    done = {}
    pending = list(plan)
    alive_since = {}
    tick = 0
    while pending or eng.busy:
        # staggered admissions: 0-2 submissions between ticks
        for _ in range(int(rng.integers(0, 3))):
            if not pending:
                break
            req = pending.pop(0)
            eng.submit(ServeRequest(
                req["rid"], embeds=req["emb"],
                max_new_tokens=req["budget"], temperature=0.0,
                adapter_id=req["adapter"],
                prefix_id="sys" if req["prefix"] else None))
            alive_since[req["rid"]] = tick
        for rid, after in list(cancel_at.items()):
            if rid in alive_since and tick - alive_since[rid] >= after \
                    and rid not in done:
                eng.cancel(rid)
                del cancel_at[rid]
        for c in eng.step():
            done[c.request_id] = c
        tick += 1
        assert tick < 2000, "fuzz run did not converge"

    assert len(done) == len(plan)
    cancelled = [r for r, c in done.items() if c.finish_reason == "cancelled"]
    for req in plan:
        c = done[req["rid"]]
        if c.finish_reason == "cancelled":
            continue
        base = merged[req["adapter"]] if req["adapter"] else params
        ref = _oneshot(base, cfg, req["emb"], req["budget"],
                       prefix_emb=prefix_emb if req["prefix"] else None)
        assert c.tokens == ref, (req["rid"], c.tokens, ref)
        assert c.finish_reason in ("eos", "length")
        assert len(c.tokens) <= req["budget"]

    # adapters must have mattered for the run to prove anything
    a_req = next(r for r in plan if r["adapter"] and
                 done[r["rid"]].finish_reason != "cancelled")
    base_ref = _oneshot(params, cfg, a_req["emb"], a_req["budget"])
    assert done[a_req["rid"]].tokens != base_ref or len(base_ref) <= 1

    # zero leaked state after the storm
    assert not eng._slot_owner and not eng._chunking and not eng._queue
    assert not np.any(eng.state["active"][:eng.max_slots])
    assert not eng._t_submit, "latency stamps leaked"
    assert eng.counters["completions"] == len(plan) - len(cancelled)
    assert eng.counters["cancelled"] == len(cancelled)
    assert len(cancelled) >= 1, "no cancel ever landed; weaken cancel_at"
